"""Eval-only int8 accuracy on a REAL trained checkpoint (CPU, no chip).

Re-measures the docs/quant-int8.md accuracy table — policy total
variation, argmax agreement, and value MAE vs the f32 forward — for the
production bf16 path and the int8 path (dynamic and static-calibrated
scales), on positions sampled from the run's own replay data. Round 3's
table used a checkpoint that was later destroyed; this keeps the
measurement repeatable against whatever is archived (ADVICE r3: the
int8 agreement gate must be re-measured on real trained weights).

    python scripts/quant_accuracy.py [ckpt_dir] [data.npz] [n_positions]

``ckpt_dir`` may also be an archived npz (scripts/archive_model.py), in
which case it is restored into a temp checkpoint first.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/repo/run_r4/checkpoints/iteration_1"
data_path = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/repo/run_r4/checkpoints/training_data.npz"
n_pos = int(sys.argv[3]) if len(sys.argv) > 3 else 256

if ckpt_dir.endswith(".npz"):
    import subprocess

    tmp = tempfile.mkdtemp(prefix="quant_acc_")
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "archive_model.py"),
                    "restore", ckpt_dir, tmp, "restored"], check=True)
    ckpt_dir = os.path.join(tmp, "restored")

from alphazero_tpu.arena.runner import load_model_variables
from alphazero_tpu.config import Config
from alphazero_tpu.models.network import policy_value_apply
from alphazero_tpu.models.quant import calibrate, quant_apply, \
    quantize_network

cfg = Config(checkpoint_dir=os.path.dirname(ckpt_dir) or ".")
net, variables = load_model_variables(cfg, ckpt_dir)
f32_net = net.clone(dtype=jnp.float32)
bf16_net = net.clone(dtype=jnp.bfloat16)

data = np.load(data_path, mmap_mode="r")
total = len(data["states"])
idx = np.sort(np.random.default_rng(0).choice(
    total, size=min(n_pos, total), replace=False))
planes = jnp.asarray(np.array(data["states"][idx]).astype(np.float32))
print(f"{len(idx)} positions from {data_path} ({total} on disk); "
      f"checkpoint {ckpt_dir}")

qp = quantize_network(net, variables)
cal_idx = np.sort(np.random.default_rng(1).choice(
    total, size=min(256, total), replace=False))
cal = jnp.asarray(np.array(data["states"][cal_idx]).astype(np.float32))
act_scales = calibrate(qp, [cal])


from alphazero_tpu.models.network import wl_to_value

ref_pi, ref_v = map(np.asarray, policy_value_apply(f32_net, variables,
                                                   planes))

arms = {}
arms["bf16 (production)"] = policy_value_apply(bf16_net, variables, planes)
for name, scales in (("int8 dynamic", None),
                     ("int8 static-calibrated", act_scales)):
    logits, wl_l = quant_apply(qp, planes, act_scales=scales)
    arms[name] = (jax.nn.softmax(logits.astype(jnp.float32), -1),
                  wl_to_value(wl_l.astype(jnp.float32)))

print(f"\n{'arm':<24} {'TV mean':>8} {'TV p95':>8} {'argmax':>8} "
      f"{'val MAE':>8}")
for name, (pi, v) in arms.items():
    pi, v = np.asarray(pi, np.float32), np.asarray(v, np.float32)
    tv = 0.5 * np.abs(pi - ref_pi).sum(-1)
    agree = (pi.argmax(-1) == ref_pi.argmax(-1)).mean()
    mae = np.abs(v - ref_v).mean()
    print(f"{name:<24} {tv.mean():>8.4f} {np.percentile(tv, 95):>8.4f} "
          f"{100 * agree:>7.1f}% {mae:>8.4f}")
