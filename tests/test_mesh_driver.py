"""Driver with the walker axis sharded over the (virtual) device mesh:
results must match the single-device run exactly (embarrassingly parallel;
sharding changes layout, not math)."""

import jax
import numpy as np
import pytest

from detqmc_tpu.driver import DetQMC, DriverConfig
from detqmc_tpu.models.hubbard import HubbardConfig, HubbardModel


def test_sharded_driver_matches_single_device():
    assert len(jax.devices()) == 8
    cfg = HubbardConfig(L=2, U=4.0, beta=2.0, m=16, s=4, dtype="float64")
    base = dict(sweeps=20, thermalization=5, n_walkers=8, seed=3,
                block_meas=10)
    res1 = DetQMC(HubbardModel(cfg), DriverConfig(**base)).run()
    qmc = DetQMC(HubbardModel(cfg), DriverConfig(**base, mesh_devices=8))
    res8 = qmc.run()
    # states are actually distributed
    shard_devs = {d for s in qmc.states.G.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8
    for name in res1:
        np.testing.assert_allclose(res1[name][0], res8[name][0],
                                   rtol=1e-10, err_msg=name)


def test_sharded_driver_validates_divisibility():
    cfg = HubbardConfig(L=2, beta=1.0, m=8, s=4, dtype="float64")
    qmc = DetQMC(HubbardModel(cfg),
                 DriverConfig(sweeps=4, thermalization=2, n_walkers=3,
                              mesh_devices=2, block_meas=2))
    with pytest.raises(ValueError):
        qmc.init()