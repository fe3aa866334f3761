"""Training loop: scan-fused stepping, metrics, checkpoint/resume.

Design: the host submits CHUNKS of steps as one jitted
``lax.scan(fused_step, state, pair_idx_chunk)`` call — the device runs
``chunk_size`` full train steps (batch assembly + curriculum + optimizer)
without returning to Python. Metrics come back as (chunk, k) arrays and are
written to JSONL (the reference's wandb key set: loss / meta_loss /
difficulty / success_rate / eta / probs / avg_weight — old/eta_bound.py:142-150).

Checkpointing fixes the reference's gap (SURVEY.md §5): curriculum state
(eta + its optimizer moments, difficulty, weight table), PRNG key, and the
step cursor are all part of the checkpoint, so resume is exact — the
reference only saves final model weights (train/train_lce.py:103).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pacednegatives_tpu.train.state import TrainState


class MetricWriter:
    """JSONL metric stream (one line per logged step), with optional wandb
    mirroring when the package exists and a project is named (parity with
    the reference's per-step wandb.log, old/eta_bound.py:142-150; this
    environment has no wandb, so JSONL is the primary sink)."""

    def __init__(self, path: str | None, wandb_project: str | None = None,
                 wandb_config: dict | None = None):
        self._f = open(path, "a") if path else None
        self.history: list[dict] = []
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, config=wandb_config or {}
                )
            except Exception:
                self._wandb = None

    def write(self, record: dict[str, Any]) -> None:
        rec = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in record.items()
        }
        self.history.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(rec)

    def flush(self) -> None:
        if self._f:
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None


# -- checkpointing -----------------------------------------------------------


def _to_saveable(state: TrainState) -> dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "curriculum": state.curriculum,
        "step": state.step,
        "key": jax.random.key_data(state.key),
    }


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_saveable(state), force=True)
    ckptr.wait_until_finished()


def latest_checkpoint(out_dir: str) -> str | None:
    """Newest step_N checkpoint under ``out_dir`` (else 'final' if present).

    Enables crash-restart ("elastic recovery" in SURVEY §5 terms): rerunning
    the same config with resume_from="auto" continues from the last save.
    """
    if not os.path.isdir(out_dir):
        return None
    steps = []
    for name in os.listdir(out_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append((int(name[5:]), name))
    if steps:
        return os.path.join(out_dir, max(steps)[1])
    final = os.path.join(out_dir, "final")
    return final if os.path.exists(final) else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (an initialized state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, _to_saveable(template)
    )
    restored = ckptr.restore(os.path.abspath(path), target)
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        curriculum=restored["curriculum"],
        step=restored["step"],
        key=jax.random.wrap_key_data(restored["key"]),
    )


# -- index stream ------------------------------------------------------------


def pair_index_stream(
    num_pairs: int,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    exclude=None,
) -> Iterator[np.ndarray]:
    """Deterministic epoch-permuted (B,) pair-index batches, forever.

    ``exclude``: pair rows withheld from training (the held-out eval set)."""
    pool = np.arange(num_pairs)
    if exclude is not None and len(exclude) > 0:
        pool = np.setdiff1d(pool, np.asarray(exclude))
    if len(pool) < batch_size:
        raise ValueError(
            f"{len(pool)} trainable pairs < batch_size={batch_size}: no full "
            "batch can be formed (the stream would spin forever)"
        )
    rng = np.random.default_rng(seed)
    n = len(pool)
    while True:
        order = rng.permutation(pool) if shuffle else pool
        for i in range(n // batch_size):
            yield order[i * batch_size : (i + 1) * batch_size].astype(np.int32)


# -- loop ---------------------------------------------------------------------


@dataclasses.dataclass
class TrainLoop:
    fused_step: Callable  # (state, (B,) pair_idx) -> (state, metrics)
    num_pairs: int
    batch_size: int
    chunk_size: int = 16  # steps per device dispatch
    seed: int = 0
    shuffle: bool = True
    log_every_chunks: int = 1
    # "last": chunk-final step only; "mean": per-chunk aggregates;
    # "all": one row per step (reference logs every step,
    # old/eta_bound.py:142-150 — inside-chunk history is not discarded)
    log_mode: str = "last"
    checkpoint_dir: str | None = None
    checkpoint_every_steps: int = 0
    # Optional held-out evaluation: eval_fn(state) -> {metric: float},
    # called every eval_every_steps; results land in the metric stream with
    # an "eval/" prefix (online regression signal, SURVEY §4/§5).
    eval_fn: Callable | None = None
    eval_every_steps: int = 0
    exclude_pairs: tuple = ()  # held-out rows never fed to training
    # When set, the corpus crosses the jit boundary as an ARGUMENT each
    # chunk instead of a closure constant baked into the HLO (DeviceCorpus
    # pytree note; required at MS MARCO corpus scale). fused_step must then
    # accept a third ``corpus`` parameter.
    corpus: object | None = None

    def __post_init__(self):
        if self.corpus is not None:
            def chunk_fn(state, idx_chunk, corpus):
                body = lambda s, i: self.fused_step(s, i, corpus)
                return jax.lax.scan(body, state, idx_chunk)
        else:
            def chunk_fn(state, idx_chunk, corpus):
                return jax.lax.scan(self.fused_step, state, idx_chunk)

        self._jit_chunk = jax.jit(chunk_fn, donate_argnums=0)
        self._chunk_fn = lambda state, idx: self._jit_chunk(
            state, idx, self.corpus
        )

    def run(
        self,
        state: TrainState,
        total_steps: int,
        writer: MetricWriter | None = None,
    ) -> TrainState:
        writer = writer or MetricWriter(None)
        stream = pair_index_stream(
            self.num_pairs, self.batch_size, self.seed, self.shuffle,
            exclude=self.exclude_pairs,
        )
        start_step = int(state.step)
        # skip batches already consumed (exact resume)
        for _ in range(start_step):
            next(stream)

        t0 = time.time()
        done = start_step
        chunk_i = 0
        last_ckpt = done
        last_eval = done
        while done < total_steps:
            n = min(self.chunk_size, total_steps - done)
            idx = np.stack([next(stream) for _ in range(n)])
            state, metrics = self._chunk_fn(state, jnp.asarray(idx))
            done += n
            chunk_i += 1

            if chunk_i % self.log_every_chunks == 0:
                host = {
                    k: np.asarray(v) for k, v in jax.device_get(metrics).items()
                }
                sps = done_per_sec(done - start_step, t0)
                if self.log_mode == "all":
                    for t in range(n):
                        row = {k: v[t] for k, v in host.items()}
                        if t == n - 1:
                            row["steps_per_sec"] = sps
                        writer.write({"step": done - n + 1 + t, **row})
                elif self.log_mode == "mean":
                    writer.write(
                        {
                            "step": done,
                            **{k: v.mean() for k, v in host.items()},
                            "steps_per_sec": sps,
                        }
                    )
                else:
                    writer.write(
                        {
                            "step": done,
                            **{k: v[-1] for k, v in host.items()},
                            "steps_per_sec": sps,
                        }
                    )
                writer.flush()

            # boundary-crossing cadence: chunked stepping means ``done`` only
            # hits multiples of chunk_size, so modulo tests alias to
            # lcm(chunk, every) or never fire
            if (
                self.checkpoint_dir
                and self.checkpoint_every_steps
                and done - last_ckpt >= self.checkpoint_every_steps
            ):
                last_ckpt = done
                save_checkpoint(
                    os.path.join(self.checkpoint_dir, f"step_{done}"), state
                )

            if (
                self.eval_fn is not None
                and self.eval_every_steps
                and done - last_eval >= self.eval_every_steps
            ):
                last_eval = done
                ev = self.eval_fn(state)
                writer.write(
                    {"step": done, **{f"eval/{k}": v for k, v in ev.items()}}
                )
                writer.flush()

        writer.write({"step": done, "time": time.time() - t0})
        writer.flush()
        return state


def done_per_sec(steps: int, t0: float) -> float:
    dt = time.time() - t0
    return steps / dt if dt > 0 else 0.0
