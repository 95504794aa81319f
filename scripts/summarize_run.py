"""Summarize a training run's metrics.jsonl for the run docs.

    python scripts/summarize_run.py [metrics.jsonl] [--every N]

Prints a per-N-iteration table (loss, loss_pi, loss_wl, lr, buffer,
throughput) plus round-2 comparison anchors (docs/plateau.md: the
128-lane run ended flat at loss 1.557 / pi 1.111 / wl 0.446 at
iteration 32 — same games/iteration, so curves compare per-iteration).
"""
import json
import sys

args = sys.argv[1:]
every = 5
if "--every" in args:
    i = args.index("--every")
    every = int(args[i + 1])
    del args[i:i + 2]
path = args[0] if args else "/root/repo/run_r4/checkpoints/metrics.jsonl"

rows = [json.loads(l) for l in open(path) if l.strip()]
if not rows:
    sys.exit("no metrics yet")

print(f"{'iter':>4} {'loss':>6} {'pi':>6} {'wl':>6} {'lr':>8} "
      f"{'buffer':>7} {'sp_s':>6} {'ln_s':>6} {'games/hr':>8}")
for r in rows:
    i = r["iteration"]
    if i % every == 0 or i == 1 or r is rows[-1]:
        print(f"{i:>4} {r['loss']:>6.3f} {r['loss_pi']:>6.3f} "
              f"{r['loss_wl']:>6.3f} {r['lr']:>8.6f} {r['buffer']:>7} "
              f"{r.get('selfplay_seconds', 0):>6.1f} "
              f"{r.get('learn_seconds', 0):>6.1f} "
              f"{r.get('games_per_hour', 0):>8.1f}")

last = rows[-1]
n = len(rows)
at32 = next((r for r in rows if r["iteration"] == 32), None)
print(f"\n{n} iterations; latest loss {last['loss']:.3f} "
      f"(pi {last['loss_pi']:.3f}, wl {last['loss_wl']:.3f})")
if at32:
    print(f"plateau anchor — iteration 32: loss {at32['loss']:.3f} vs "
          f"round-2's 1.557 (pi {at32['loss_pi']:.3f} vs 1.111, "
          f"wl {at32['loss_wl']:.3f} vs 0.446)")
itr_s = [r["selfplay_seconds"] + r["learn_seconds"] for r in rows[2:]
         if "selfplay_seconds" in r and "learn_seconds" in r]
if itr_s:
    avg = sum(itr_s) / len(itr_s)
    print(f"steady-state iteration wall: {avg:.0f}s "
          f"(~{3600 / avg * 1:.1f} iterations/hr)")
