"""detqmc-pt-sdw — SDW parallel-tempering binary.

Reference parity: SURVEY.md §3 "CLI mains" (maindetqmcptsdwopdim.cpp;
mpirun -n R is replaced by the `values` grid over the replica axis of one
device/mesh program).

Config keys: everything main_sdw takes, plus
    values = r0,r1,...      control-parameter grid (one replica each)
    exchangeInterval = n    sweep pairs between exchange attempts
    ptEnsembles = E         independent PT systems vmapped into the
                            device batch (E chains per parameter value;
                            fills the chip where batch=R would starve it)
"""

from __future__ import annotations

import sys

from detqmc_tpu import compile_cache
from detqmc_tpu.config import (
    ConfigurationError,
    _PT_KEYS,
    _SDW_KEYS,
    build_driver_config,
    build_sdw_config,
    parse_args,
    pt_params,
    split_params,
)
from detqmc_tpu.parallel.pt_driver import DetQMCPT, PTConfig


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        params = parse_args(argv)
        model_p, driver_p, extra = split_params(params, _SDW_KEYS,
                                                extra_keys=_PT_KEYS)
        cfg = build_sdw_config(model_p)
        drv = build_driver_config(driver_p)
        ptp = pt_params(extra)
        values = ptp.get("values")
        if not values:
            raise ConfigurationError(
                "parallel tempering needs `values = r0,r1,...`")
    except ConfigurationError as e:
        print(f"configuration error: {e}", file=sys.stderr)
        return 2

    compile_cache.enable()
    from detqmc_tpu.models.sdw import SDWModel

    try:
        model = SDWModel(cfg)
        qmc = DetQMCPT(model, values, drv,
                       PTConfig(exchange_interval=ptp.get(
                           "exchangeInterval", 1),
                           n_ensembles=ptp.get("ptEnsembles", 1)),
                       meta_extra={"model": "sdw-pt"})
    except ConfigurationError as e:
        print(f"configuration error: {e}", file=sys.stderr)
        return 2
    results = qmc.run()
    for k, res in results.items():
        print(f"# parameter {k} (r = {values[k]})")
        for name, (mean, err) in sorted(res.items()):
            print(f"{name} = {mean!r} +/- {err!r}")
    from detqmc_tpu.timing import timing

    print(timing.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
