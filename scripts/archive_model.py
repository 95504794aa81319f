"""Durable model archiving: checkpoint dir <-> single npz inside the repo.

Container resets have destroyed every /root/run_* checkpoint twice
(docs/run-2026-08-17-r3.md); only /root/repo survives. This tool makes
strength evidence durable: `export` squashes a trained checkpoint's
params + batch_stats into ONE committable npz (~16 MB at 20x128 in f16),
and `restore` rebuilds a full Orbax checkpoint directory from it that
every consumer (web, arena, eval scripts, trainer resume) can load.

    python scripts/archive_model.py export  <ckpt_dir> <out.npz>
    python scripts/archive_model.py restore <in.npz>  <checkpoints_dir> [name]

Lossiness: params are stored float16 (max |param| in trained nets here is
~30, well inside f16 range; the round-trip error is ~1e-4 relative, far
below quantization noise already tolerated in inference — the int8 path
tolerates 100x more, docs/quant-int8.md). batch_stats stay float32 (BN
running vars can be tiny; f16 underflow would break inference-mode
normalization). The optimizer state is NOT archived: a restored
checkpoint plays/evaluates identically but resuming *training* from it
restarts Adam moments (learn_calls IS preserved, so the cosine schedule
position survives).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")  # host-side tensor shuffling only

import numpy as np
from flax import traverse_util


def export(ckpt_dir: str, out_npz: str) -> None:
    from alphazero_tpu.config import Config
    from alphazero_tpu.models.network import init_network
    from alphazero_tpu.train import checkpoint as ckpt
    from alphazero_tpu.train.learner import create_train_state

    arch = ckpt.checkpoint_arch(ckpt_dir)
    cfg = Config().replace(
        num_blocks=arch["num_blocks"], num_filters=arch["num_filters"],
        se_ratio=arch.get("se_ratio", 8),
        scan_blocks=arch.get("scan_blocks", False))
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    state = ckpt.load_checkpoint(
        ckpt_dir, create_train_state(cfg, net, variables))

    flat = {}
    for prefix, tree, dt in (("params", state.params, np.float16),
                             ("batch_stats", state.batch_stats, np.float32)):
        for path, leaf in traverse_util.flatten_dict(tree).items():
            flat[prefix + "/" + "/".join(path)] = np.asarray(leaf).astype(dt)
    flat["__meta__"] = np.frombuffer(json.dumps({
        "arch": arch,
        "iteration": int(np.asarray(state.iteration)),
        "learn_calls": int(np.asarray(state.learn_calls)),
    }).encode(), np.uint8)
    np.savez_compressed(out_npz, **flat)
    n = sum(v.size for k, v in flat.items() if k.startswith("params/"))
    print(f"archived {ckpt_dir} -> {out_npz}: {n:,} params f16, "
          f"iteration {json.loads(bytes(flat['__meta__']))['iteration']}, "
          f"{os.path.getsize(out_npz) / 1e6:.1f} MB")


def restore(in_npz: str, checkpoints_dir: str, name: str = None) -> None:
    from alphazero_tpu.config import Config
    from alphazero_tpu.models.network import init_network
    from alphazero_tpu.train import checkpoint as ckpt
    from alphazero_tpu.train.learner import create_train_state

    data = np.load(in_npz)
    meta = json.loads(bytes(data["__meta__"]))
    arch = meta["arch"]
    cfg = Config(checkpoint_dir=checkpoints_dir).replace(
        num_blocks=arch["num_blocks"], num_filters=arch["num_filters"],
        se_ratio=arch.get("se_ratio", 8),
        scan_blocks=arch.get("scan_blocks", False))
    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    state = create_train_state(cfg, net, variables)

    def rebuild(prefix, template):
        flat = traverse_util.flatten_dict(template)
        out = {}
        for path, leaf in flat.items():
            key = prefix + "/" + "/".join(path)
            arr = data[key].astype(np.asarray(leaf).dtype)
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            out[path] = arr
        return traverse_util.unflatten_dict(out)

    state = state.replace(
        params=rebuild("params", state.params),
        batch_stats=rebuild("batch_stats", state.batch_stats),
        learn_calls=np.int32(meta["learn_calls"]),
        iteration=np.int32(meta["iteration"]))
    path = ckpt.save_iteration_checkpoint(
        cfg, state, meta["iteration"], name=name)
    print(f"restored {in_npz} -> {path} "
          f"(iteration {meta['iteration']}, learn_calls "
          f"{meta['learn_calls']}, fresh optimizer state)")


if __name__ == "__main__":
    if len(sys.argv) < 4 or sys.argv[1] not in ("export", "restore"):
        sys.exit(__doc__)
    if sys.argv[1] == "export":
        export(sys.argv[2], sys.argv[3])
    else:
        restore(sys.argv[2], sys.argv[3],
                sys.argv[4] if len(sys.argv) > 4 else None)
