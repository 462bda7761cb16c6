"""Paired multi-sequence accuracy protocol.

Single-run keyframe ATE on one rendered sequence has a measured ~2x chaos
floor (semantically neutral config perturbations moved kf ATE 0.027 ->
0.045/0.057/0.060 on the round-3 head-to-head sequence), so any one-run
A/B below that effect size is noise. This harness renders several photo
scenes (different SCENE_SEEDs), runs the compiled C++ reference once per
sequence, and runs the rebuild once per (sequence x condition), reporting
per-sequence pairs and cross-sequence means for both ATE and the
lower-variance drift_per_m metric.

Usage:
  python scripts/multirun.py --conditions "" "level_map=0" [--frames 300]
      [--seeds 5 11 23] [--skip-ref]

Each condition is a space-separated ab_ours override string ("" = config
defaults). Results accumulate in /tmp/multirun/<seed>_<cond>.json and are
reused on re-invocation (delete the file to re-run one cell).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/multirun"


def seq_dir(seed: int) -> str:
    return "/tmp/refseq2" if seed == 5 else f"/tmp/refseq_s{seed}"


def ensure_reference(seed: int, frames: int):
    """Render the sequence + run the C++ reference once (cached)."""
    d = seq_dir(seed)
    cmp_path = os.path.join(d, "compare.json")
    if os.path.exists(cmp_path):
        with open(cmp_path) as f:
            c = json.load(f)
        if (c.get("reference") or {}).get("traj"):
            return c["reference"]["traj"]
    env = dict(os.environ, SEQ_DIR=d, SCENE_SEED=str(seed))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_compare.py"),
         "--cpu", "--skip-ours", "--frames", str(frames)],
        env=env, check=True, timeout=7200)
    with open(cmp_path) as f:
        return json.load(f)["reference"]["traj"]


def run_ours(seed: int, cond: str, frames: int, tpu: bool = False):
    tag = cond.replace(" ", "+").replace("=", "-") or "default"
    if tpu:
        tag += "_tpu"
    cache = os.path.join(OUT, f"s{seed}_{tag}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    env = dict(os.environ, SEQ_DIR=seq_dir(seed), SCENE_SEED=str(seed))
    cmd = [sys.executable, os.path.join(REPO, "scripts", "ab_ours.py"),
           "--frames", str(frames)] + ([] if tpu else ["--cpu"]) \
        + (cond.split() if cond else [])
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=3600)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not line:
        sys.stderr.write(p.stderr[-2000:])
        raise RuntimeError(f"ab_ours failed for s{seed} cond={cond!r}")
    res = json.loads(line[-1])
    with open(cache, "w") as f:
        json.dump(res, f)
    return res


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="+", default=[5, 11, 23])
    ap.add_argument("--conditions", nargs="+", default=[""])
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run the rebuild side on the real TPU chip "
                         "(cache entries tagged _tpu; never mixed with CPU)")
    ap.add_argument("--out", default=OUT,
                    help="result cache directory (use a fresh one after "
                         "any code change that affects tracking, so stale "
                         "cached runs are never mixed into a campaign)")
    args = ap.parse_args()
    OUT = args.out
    os.makedirs(OUT, exist_ok=True)

    refs = {}
    if not args.skip_ref:
        for seed in args.seeds:
            refs[seed] = ensure_reference(seed, args.frames)
            print(f"ref  s{seed}: kf_ate={refs[seed]['ate']:.5f} "
                  f"drift={refs[seed].get('drift_per_m', -1):.5f}",
                  flush=True)

    table = {}
    for cond in args.conditions:
        for seed in args.seeds:
            r = run_ours(seed, cond, args.frames, tpu=args.tpu)
            table[(cond, seed)] = r
            print(f"ours s{seed} [{cond or 'default'}]: "
                  f"kf_ate={r['kf_ate']:.5f} "
                  f"drift={r.get('kf_drift_per_m', -1):.5f} "
                  f"inl={r['mean_inliers']}", flush=True)

    print("\n=== summary (mean over seeds) ===")
    for cond in args.conditions:
        ates = [table[(cond, s)]["kf_ate"] for s in args.seeds]
        drifts = [table[(cond, s)].get("kf_drift_per_m", -1)
                  for s in args.seeds]
        line = (f"[{cond or 'default'}] kf_ate mean={sum(ates)/len(ates):.5f} "
                f"min={min(ates):.4f} max={max(ates):.4f} "
                f"{[round(a, 4) for a in ates]} "
                f"drift mean={sum(drifts)/len(drifts):.5f}")
        if refs:
            ratio = [table[(cond, s)]["kf_ate"] / max(refs[s]["ate"], 1e-12)
                     for s in args.seeds]
            line += f" ate_ratio_vs_ref={[round(r, 2) for r in ratio]}"
        print(line)

    # --- paired-difference verdicts: condition i vs the FIRST condition ---
    # A lever is ACCEPTED only if it improves the paired log-ratio on a
    # clear majority of seeds AND the geometric-mean improvement beats the
    # measured single-run chaos floor (~2x single-seed => require the
    # n-seed geomean to move by > floor^(1/sqrt(n)), i.e. the noise of an
    # n-seed mean). Sign consistency guards against one lucky seed.
    import math
    base = args.conditions[0]
    n = len(args.seeds)
    floor_single = 2.0
    floor_mean = floor_single ** (1.0 / math.sqrt(n))
    if len(args.conditions) > 1:
        print(f"\n=== paired verdicts vs [{base or 'default'}] "
              f"(n={n} seeds, geomean must beat {floor_mean:.2f}x) ===")
    for cond in args.conditions[1:]:
        logr = [math.log(table[(cond, s)]["kf_ate"]
                         / max(table[(base, s)]["kf_ate"], 1e-12))
                for s in args.seeds]
        wins = sum(1 for v in logr if v < 0)
        gm = math.exp(sum(logr) / n)   # <1 = cond better
        if gm < 1.0 / floor_mean and wins >= (n + 1) // 2 + (n > 3):
            verdict = "ACCEPT"
        elif gm > floor_mean and (n - wins) >= (n + 1) // 2 + (n > 3):
            verdict = "REJECT (worse)"
        else:
            verdict = "INCONCLUSIVE"
        print(f"[{cond}] geomean_ratio={gm:.3f} wins={wins}/{n} -> {verdict}")


if __name__ == "__main__":
    main()
