"""deteval console entry (see detqmc_tpu.analysis.deteval)."""

from detqmc_tpu.analysis.deteval import main

if __name__ == "__main__":
    raise SystemExit(main())
