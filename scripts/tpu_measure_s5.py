"""Session-5 TPU batch: the sections the ctrinv Mosaic bug blocked."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from detqmc_tpu import compile_cache
compile_cache.enable()
import tpu_measure as tm

def main():
    tm.say(jax.devices())
    sections = [
        ("sdw L=8", lambda: tm.sdw_compare(8, 128)),
        ("delayed L=8", lambda: tm.sdw_delayed_compare(8, 128)),
        ("cb_apply L=8", lambda: tm.sdw_cb_apply_compare(8, 128)),
        ("walker scaling", lambda: tm.sdw_walker_scaling(4, (256, 512))),
    ]
    failed = []
    for name, fn in sections:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            import traceback
            tm.say(f"!! section {name!r} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
            failed.append(name)
    tm.say(f"batch done; failed sections: {failed or 'none'}")

if __name__ == "__main__":
    main()
