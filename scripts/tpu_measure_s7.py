"""Focused one-config timing for env-selected kernel variants.

The compact-WY QR (DETQMC_TPU_QR=wy) and blocked triangular inverse
(DETQMC_TPU_TRINV=blocked) are chosen at trace time from the
environment, so each variant needs its own process:

    python scripts/tpu_measure_s7.py                 # baseline
    DETQMC_TPU_QR=wy python scripts/tpu_measure_s7.py
    DETQMC_TPU_TRINV=blocked python scripts/tpu_measure_s7.py
    DETQMC_TPU_QR=wy DETQMC_TPU_TRINV=blocked python scripts/tpu_measure_s7.py

Times the SDW O(3) L=8 W=128 native-chain refine config (the one whose
column-lane QR/trinv dominate).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from detqmc_tpu import compile_cache
compile_cache.enable()

import tpu_measure as tm
from detqmc_tpu.models.sdw import SDWConfig, SDWModel


def main():
    tm.say(jax.devices(), "QR=", os.environ.get("DETQMC_TPU_QR", "-"),
           "TRINV=", os.environ.get("DETQMC_TPU_TRINV", "-"))
    L, W = 8, 128
    base = dict(L=L, opdim=3, r=0.5, beta=4.0, m=40, s=4,
                dtype="float32", checkerboard=True,
                fermion_repr="native_pair")
    model = SDWModel(SDWConfig(**base))
    tm.timed_sweeps(model, W, f"refine L={L} "
                    f"qr={os.environ.get('DETQMC_TPU_QR', 'panel')} "
                    f"trinv={os.environ.get('DETQMC_TPU_TRINV', 'col')}")


if __name__ == "__main__":
    main()
