"""Worker process for the multi-process DCN rehearsal test.

Each worker is one "host": 2 virtual CPU devices, joined into a 4-device
global mesh via jax.distributed (gloo collectives over localhost — the CPU
stand-in for DCN). Drives a REAL sharded curriculum train step: per-process
local batch -> global data-parallel array -> fused LCE step (psum'd grads,
eta update) -> prints the per-step loss/eta so the parent can assert both
hosts agree bit-for-bit.

Usage: python tests/dcn_worker.py <coordinator_port> <process_id> <nprocs>
"""

import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU cross-process collectives ride gloo (the DCN stand-in)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from pacednegatives_tpu.parallel.distributed import (  # noqa: E402
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs, jax.device_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pacednegatives_tpu.curriculum import EtaController  # noqa: E402
from pacednegatives_tpu.data import (  # noqa: E402
    DeviceCorpus,
    HashTokenizer,
    TextCorpus,
    TokenizedStore,
    TripletStore,
)
from pacednegatives_tpu.models import T5Config, init_params  # noqa: E402
from pacednegatives_tpu.parallel import (  # noqa: E402
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
)
from pacednegatives_tpu.train import (  # noqa: E402
    init_train_state,
    make_optimizer,
    make_train_step,
)

# identical deterministic inputs on every host
corpus = TextCorpus.synthetic(num_docs=32, num_queries=8, seed=7)
tok = HashTokenizer(vocab_size=256)
store = TokenizedStore.build(corpus, tok, max_q_tokens=6, max_d_tokens=16)
triples = TripletStore.synthetic(corpus, n_pairs=16, n_neg=8, seed=7)
dc = DeviceCorpus.build(store, triples)
cfg = T5Config.tiny(vocab_size=256)
params = init_params(jax.random.key(0), cfg)

mesh = create_mesh(MeshConfig(data=-1))
n = 2
ctrl = EtaController(eta0=0.5, meta_lr=0.01, warmup_steps=2, total_steps=12,
                     ce_scale=2.0 * float(np.log(256)))
tx = make_optimizer(lr=1e-3, total_steps=12)
step = make_train_step(cfg, ctrl, tx, loss="lce", n_neg_per_example=n,
                       use_mean=True, rel_id=tok.true_id, nrel_id=tok.false_id)

GLOBAL_BATCH = 8
LOCAL = GLOBAL_BATCH // nprocs


def global_batch(step_i: int):
    """Assemble the per-host slice of a deterministic global batch and join
    it into one jax.Array sharded over the data axis (the multi-host input
    pipeline contract: each host feeds only its addressable shard)."""
    rng = np.random.default_rng(100 + step_i)  # same stream on every host
    pair_idx = rng.integers(0, dc.num_pairs, size=GLOBAL_BATCH).astype(np.int32)
    key = jax.random.key(1000 + step_i)
    # batch assembly itself is jittable/device-local; here we run it on host
    # rows for the local slice only
    local = pair_idx[pid * LOCAL:(pid + 1) * LOCAL]
    batch = jax.device_get(
        jax.jit(lambda i: dc.lce_batch(key, i, jnp.float32(0.5), n))(local)
    )
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sh = batch_sharding(mesh, max(v.ndim, 1))
        out[k] = jax.make_array_from_process_local_data(
            sh, v, (GLOBAL_BATCH * (v.shape[0] // LOCAL),) + v.shape[1:]
        )
    return out


with mesh:
    # In multi-process jax, host values cannot be device_put to a global
    # (non-addressable) sharding; create the replicated global state INSIDE
    # jit instead — every process traces the same deterministic init.
    state = jax.jit(
        lambda: init_train_state(
            init_params(jax.random.key(0), cfg), tx, ctrl.init()
        ),
        out_shardings=replicated(mesh),
    )()
    jstep = jax.jit(step, donate_argnums=0)
    for i in range(3):
        state, metrics = jstep(state, global_batch(i))
        host = jax.device_get(metrics)
        print(
            f"STEP {i} loss={float(host['loss']):.6f} "
            f"eta={float(host['eta']):.6f} "
            f"difficulty={float(host['difficulty']):.6f}",
            flush=True,
        )
print("DCN_OK", flush=True)
