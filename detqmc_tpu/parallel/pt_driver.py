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
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detqmc_tpu import checkpoint as ckpt_mod
from detqmc_tpu import compile_cache
from detqmc_tpu.driver import DriverConfig
from detqmc_tpu.metadata import Metadata, write_metadata
from detqmc_tpu.observables import ObservableHandler
from detqmc_tpu.parallel import pt as pt_mod


@dataclasses.dataclass(frozen=True)
class PTConfig:
    exchange_interval: int = 1   # sweep pairs between exchange attempts
    # which model parameter the exchange swaps (reference: the PT config's
    # controlParameter — "r" for the SDW model). Validated against the
    # model's declared ``control_parameter`` at driver construction and
    # echoed into the per-run metadata.
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
        supported = getattr(model, "control_parameter", "r")
        if pt_params.control_parameter != supported:
            from detqmc_tpu.exceptions import ConfigurationError

            raise ConfigurationError(
                f"PT control_parameter={pt_params.control_parameter!r} "
                f"but {type(model).__name__} exchanges "
                f"{supported!r} (its with_r/exchange_action hooks)")
        self.r_values = jnp.asarray(np.asarray(r_values, np.float64),
                                    model.cfg.jdtype)
        self.R = len(r_values)
        self.meta = {k: str(v) for k, v in
                     dataclasses.asdict(model.cfg).items()}
        self.meta.update({
            "exchangeInterval": str(pt_params.exchange_interval),
            "controlParameter": pt_params.control_parameter,
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
        for h in self.handlers:
            h.register_vectors(getattr(model, "vector_observables", ()))
        self.measurements_done = 0
        self.therm_done = 0
        self._t_start = time.time()
        from detqmc_tpu.driver import ConsistencyLogger

        self._consistency = ConsistencyLogger(params.outdir, self.meta)
        self._phi_streams: Dict[int, Any] = {}

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

    # -- checkpoint / resume (reference: PT saves per-rank state + master
    # assignment, SURVEY.md §6 "Checkpoint / resume") ------------------------
    @property
    def _ckpt_path(self) -> Optional[str]:
        if self.p.outdir is None:
            return None
        return os.path.join(self.p.outdir, "state")

    def save(self) -> None:
        if self._ckpt_path is None or self.states is None:
            return
        extra: Dict[str, np.ndarray] = {}
        for k, h in enumerate(self.handlers):
            for name, arr in h.state_dict().items():
                extra[f"p{k}|{name}"] = arr
        pt = self.pt_state
        extra["pt|param_of_replica"] = np.asarray(pt.param_of_replica)
        extra["pt|key"] = np.asarray(jax.random.key_data(pt.key))
        extra["pt|n_attempted"] = np.asarray(pt.n_attempted)
        extra["pt|n_accepted"] = np.asarray(pt.n_accepted)
        extra["pt|parity"] = np.asarray(pt.parity)
        manifest: Dict[str, Any] = {
            "measurements_done": self.measurements_done,
            "therm_done": self.therm_done,
            "meta": self.meta,
        }
        ckpt_mod.save_checkpoint(self._ckpt_path, self.states, extra,
                                 manifest)

    def init(self, resume: bool = True) -> None:
        loaded = None
        if resume and self._ckpt_path:
            loaded = ckpt_mod.load_checkpoint(self._ckpt_path)
        keys = jax.random.split(jax.random.key(self.p.seed), self.R)
        if loaded is None:
            self.states = jax.jit(jax.vmap(self.model.init_state))(keys)
            self.states = jax.vmap(self.model.with_r)(
                self.states, self.r_values)
            self.pt_state = pt_mod.init_pt(
                self.R, jax.random.key(self.p.seed + 7919))
            return
        arrays, extra, manifest = loaded
        blank = jax.jit(jax.vmap(self.model.init_state))(keys)
        restored = ckpt_mod.restore_state(blank, arrays)
        self.states = jax.jit(
            jax.vmap(self.model.refresh_from_field))(restored)
        self.pt_state = pt_mod.PTState(
            param_of_replica=jnp.asarray(extra["pt|param_of_replica"],
                                         jnp.int32),
            key=jax.random.wrap_key_data(jnp.asarray(extra["pt|key"])),
            n_attempted=jnp.asarray(extra["pt|n_attempted"], jnp.int32),
            n_accepted=jnp.asarray(extra["pt|n_accepted"], jnp.int32),
            parity=jnp.asarray(extra["pt|parity"], jnp.int32),
        )
        for k, h in enumerate(self.handlers):
            pref = f"p{k}|"
            h.load_state_dict({key[len(pref):]: arr
                               for key, arr in extra.items()
                               if key.startswith(pref)})
        self.measurements_done = int(manifest.get("measurements_done", 0))
        self.therm_done = int(manifest.get("therm_done", 0))

    def _out_of_time(self, margin: float = 0.0) -> bool:
        if self.p.walltime_secs <= 0:
            return False
        return (time.time() - self._t_start + margin) >= self.p.walltime_secs

    def _dump_configs(self) -> None:
        """Per-parameter phi .binarystream dumps (reference:
        DetSDWSystemConfig per-replica config streams, SURVEY.md §3 "SDW
        config dumps"): each parameter value's stream receives the field
        of whichever replica currently holds that parameter, so the
        offline sdwcorr-over-PT pipeline reads a fixed-r ensemble."""
        if not (self.p.dump_config_stream and self.p.outdir
                and hasattr(self.states, "phi")):
            return
        from detqmc_tpu.io.binarystream import BinaryStreamWriter

        phi = np.asarray(self.states.phi)               # (R, m, N, opdim)
        rep_of_param = np.argsort(
            np.asarray(self.pt_state.param_of_replica))  # param -> replica
        for k in range(self.R):
            if k not in self._phi_streams:
                self._phi_streams[k] = BinaryStreamWriter(
                    os.path.join(self.p.outdir, f"p{k}",
                                 "phi.binarystream"), phi.shape[1:])
            self._phi_streams[k].append(phi[rep_of_param[k]])

    def run(self) -> Dict[int, Dict[str, Tuple[float, float]]]:
        """Thermalize + measure with walltime-aware checkpointing; a
        resumed run continues the exact Markov chain (reference: the
        batch-queue stop/resubmit pattern, SURVEY.md §6)."""
        if self.states is None:
            self.init()
        carry = (self.states, self.pt_state)
        ei = self.ptp.exchange_interval
        rounds_total = max(1, self.p.thermalization // ei)
        rounds_done = self.therm_done // ei
        t_block = 0.0
        while rounds_done < rounds_total:
            n = min(max(1, self.p.block_meas), rounds_total - rounds_done)
            t0 = time.time()
            carry = self._therm_block(carry, n)
            jax.block_until_ready(carry[0].phi if hasattr(carry[0], "phi")
                                  else carry[0].G)
            t_block = time.time() - t0
            rounds_done += n
            self.therm_done = rounds_done * ei
            self.states, self.pt_state = carry
            if self._out_of_time(margin=t_block):
                self.save()
                return {k: h.results()
                        for k, h in enumerate(self.handlers)}

        n_meas = self.p.n_measurements
        block = min(self.p.block_meas, max(1, n_meas))
        while self.measurements_done < n_meas:
            n = min(block, n_meas - self.measurements_done)
            t0 = time.time()
            carry, (obs, param_idx) = self._meas_block(carry, n)
            obs_np = {k: np.asarray(v) for k, v in obs._asdict().items()}
            t_block = time.time() - t0
            pidx = np.asarray(param_idx)        # (T, R)
            # route each (measurement, replica) sample to its parameter's
            # handler: one boolean-mask selection per parameter value
            # (vectorized over the whole block)
            for k in range(self.R):
                mask = pidx == k
                if not mask.any():
                    continue
                self.handlers[k].insert_batch(
                    {name: arr[mask] for name, arr in obs_np.items()})
            self.measurements_done += n
            self.states, self.pt_state = carry
            self._consistency.log(self.states)
            self._dump_configs()
            if (self.p.save_interval and self.measurements_done % max(
                    self.p.save_interval, 1) < block):
                self.save()
            if self._out_of_time(margin=t_block):
                self.save()
                break

        self.states, self.pt_state = carry
        self.save()

        results = {}
        for k, h in enumerate(self.handlers):
            if h.outdir:
                os.makedirs(h.outdir, exist_ok=True)
                h.write_output()
                write_metadata(os.path.join(h.outdir, "info.dat"),
                               dict(h.meta))
            results[k] = h.results()
        if self.p.outdir:
            info = dict(self.meta)
            info["measurementsDone"] = str(self.measurements_done)
            info.update(self._consistency.info_entries())
            write_metadata(os.path.join(self.p.outdir, "info.dat"), info)
            att = np.asarray(self.pt_state.n_attempted)
            acc = np.asarray(self.pt_state.n_accepted)
            with open(os.path.join(self.p.outdir, "exchange-rates.dat"),
                      "w") as f:
                f.write("# pair attempted accepted rate\n")
                for i in range(self.R - 1):
                    rate = acc[i] / max(att[i], 1)
                    f.write(f"{i} {att[i]} {acc[i]} {rate:.4f}\n")
        return results
