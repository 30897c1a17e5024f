"""Parallel-tempering driver (reference: DetQMCPT::run, SURVEY.md §4.3).

Runs R replicas of a model over a control-parameter grid; every
``exchange_interval`` sweep pairs the replica-exchange step swaps
parameter *labels* between replicas (configurations never move). Each
parameter value gets its own observable stream and output subdirectory —
the reference's per-r_k output contract.

Single-chip: replicas are the vmap axis. Multi-chip: shard the replica
axis over a mesh and use exchange_step_sharded (one all_gather of scalars
over ICI per exchange) — exercised by tests/test_pt.py on a virtual mesh
and by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu import compile_cache
from detqmc_tpu.driver import DriverConfig
from detqmc_tpu.metadata import Metadata, write_metadata
from detqmc_tpu.observables import ObservableHandler
from detqmc_tpu.parallel import pt as pt_mod


@dataclasses.dataclass(frozen=True)
class PTConfig:
    exchange_interval: int = 1   # sweep pairs between exchange attempts
    control_parameter: str = "r"


class DetQMCPT:
    """Owns R replica states + PT bookkeeping + per-parameter handlers."""

    def __init__(self, model, r_values: Sequence[float],
                 params: DriverConfig, pt_params: PTConfig = PTConfig(),
                 meta_extra: Optional[Metadata] = None):
        compile_cache.enable()
        self.model = model
        self.p = params
        self.ptp = pt_params
        self.r_values = jnp.asarray(np.asarray(r_values, np.float64),
                                    model.cfg.jdtype)
        self.R = len(r_values)
        self.meta = {k: str(v) for k, v in
                     dataclasses.asdict(model.cfg).items()}
        self.meta.update({
            "exchangeInterval": str(pt_params.exchange_interval),
            "controlParameterValues": ",".join(str(v) for v in r_values),
            **(meta_extra or {}),
        })
        self.handlers = [
            ObservableHandler(
                outdir=None if params.outdir is None else
                os.path.join(params.outdir, f"p{k}"),
                jk_blocks=params.jk_blocks, timeseries=params.timeseries,
                meta={**self.meta, "r": str(float(r_values[k]))})
            for k in range(self.R)
        ]
        self.measurements_done = 0
        self.therm_done = 0
        self._t_start = time.time()

        vm = jax.vmap

        def therm_round(carry, _):
            states, pt = carry
            states, _ = jax.lax.scan(
                lambda sts, x: (vm(lambda s: model.sweep_pair(
                    s, measure=False)[0])(sts), None),
                states, None, length=pt_params.exchange_interval)
            actions = vm(model.exchange_action)(states)
            pt = pt_mod.exchange_step(pt, actions, self.r_values)
            states = vm(model.with_r)(states,
                                      pt_mod.replica_r(pt, self.r_values))
            return (states, pt), None

        def meas_round(carry, _):
            states, pt = carry
            def inner(sts, x):
                sts = vm(lambda s: model.sweep_pair(
                    s, measure=False)[0])(sts)
                return sts, None
            if pt_params.exchange_interval > 1:
                states, _ = jax.lax.scan(
                    inner, states, None,
                    length=pt_params.exchange_interval - 1)
            states, obs = vm(
                lambda s: model.sweep_pair(s, measure=True))(states)
            # the measurements above ran under the INCOMING parameter
            # assignment — tag them with it before the exchange step
            # reshuffles labels (tagging post-exchange would book every
            # accepted swap's measurements into the adjacent parameter's
            # stream, biasing all PT output)
            tag = pt.param_of_replica
            actions = vm(model.exchange_action)(states)
            pt = pt_mod.exchange_step(pt, actions, self.r_values)
            states = vm(model.with_r)(states,
                                      pt_mod.replica_r(pt, self.r_values))
            return (states, pt), (obs, tag)

        self._therm_block = jax.jit(
            lambda c, n: jax.lax.scan(therm_round, c, None, length=n)[0],
            static_argnums=1)
        self._meas_block = jax.jit(
            lambda c, n: jax.lax.scan(meas_round, c, None, length=n),
            static_argnums=1)

        self.states = None
        self.pt_state = None

    def init(self) -> None:
        keys = jax.random.split(jax.random.key(self.p.seed), self.R)
        self.states = jax.jit(jax.vmap(self.model.init_state))(keys)
        self.states = jax.vmap(self.model.with_r)(
            self.states, self.r_values)
        self.pt_state = pt_mod.init_pt(
            self.R, jax.random.key(self.p.seed + 7919))

    def run(self) -> Dict[int, Dict[str, Tuple[float, float]]]:
        if self.states is None:
            self.init()
        carry = (self.states, self.pt_state)
        n_t = max(1, self.p.thermalization // self.ptp.exchange_interval)
        carry = self._therm_block(carry, n_t)
        self.therm_done = n_t * self.ptp.exchange_interval

        n_meas = self.p.n_measurements
        block = min(self.p.block_meas, n_meas)
        done = 0
        while done < n_meas:
            n = min(block, n_meas - done)
            carry, (obs, param_idx) = self._meas_block(carry, n)
            obs_np = {k: np.asarray(v) for k, v in obs._asdict().items()}
            pidx = np.asarray(param_idx)        # (T, R)
            # tag each replica's measurement with its parameter index
            for t in range(pidx.shape[0]):
                for rep in range(self.R):
                    k = int(pidx[t, rep])
                    self.handlers[k].insert_batch(
                        {name: arr[t, rep][None]
                         for name, arr in obs_np.items()})
            done += n
        self.states, self.pt_state = carry

        results = {}
        for k, h in enumerate(self.handlers):
            if h.outdir:
                os.makedirs(h.outdir, exist_ok=True)
                h.write_output()
                write_metadata(os.path.join(h.outdir, "info.dat"),
                               dict(h.meta))
            results[k] = h.results()
        if self.p.outdir:
            att = np.asarray(self.pt_state.n_attempted)
            acc = np.asarray(self.pt_state.n_accepted)
            with open(os.path.join(self.p.outdir, "exchange-rates.dat"),
                      "w") as f:
                f.write("# pair attempted accepted rate\n")
                for i in range(self.R - 1):
                    rate = acc[i] / max(att[i], 1)
                    f.write(f"{i} {att[i]} {acc[i]} {rate:.4f}\n")
        return results
