"""Measure LSH-BoW place-recognition quality on photo-textured imagery
(VERDICT round-1 item 10): precision@1 / top-4 recall of BoW retrieval vs
ground-truth viewpoint overlap, compared against raw-descriptor matching
ground truth. Decides keep-vs-replace for the 12-bit LSH vocabulary."""
import os
import sys

sys.path.insert(0, ".")
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from plslam_tpu.datasets import synthetic, textured
    from plslam_tpu.ops import extract
    from plslam_tpu.vocab import bow, orbvoc

    # optional tree-vocabulary backends to compare against the LSH default:
    # --voc PATH loads a DBoW2 text file (e.g. the reference-trained
    # /tmp/refseq2/voc.txt, k=10 L=4 — VERDICT r3 item 8 cross-validation)
    voc_paths = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--voc=")]

    scene = textured.make_photo_scene(seed=3)
    n = 36
    # loop trajectory: first and last frames revisit the same viewpoints
    Ts = synthetic.trajectory(n, "loop", amplitude=2.2)
    frames = [synthetic.render(scene, T) for T in Ts]
    print("rendered", flush=True)

    cfgE = extract.ExtractorConfig(n_features=1024, n_levels=4)
    ext = jax.jit(lambda im: extract.extract_points(im, cfgE))
    feats = [ext(jnp.asarray(f)) for f in frames]

    bows = np.stack([np.asarray(bow.bow_vector(f.desc, f.valid))
                     for f in feats])

    # ground-truth relevance: angular distance between optical axes +
    # camera-center distance (out-and-back trajectory revisits viewpoints)
    C = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])
    Z = np.stack([T[:3, :3].T @ np.array([0, 0, 1.0]) for T in Ts])
    ang = np.arccos(np.clip(Z @ Z.T, -1, 1))
    dist = np.linalg.norm(C[:, None] - C[None, :], axis=-1)
    relevant = (ang < 0.22) & (dist < 0.55)

    # retrieval eval: exclude temporal neighbors (|i-j|<=6) like the
    # covisibility exclusion; only queries that HAVE a relevant target count
    hits1 = total = 0
    hits4 = 0
    for i in range(n):
        cand = [j for j in range(n) if abs(i - j) > 6]
        if not cand or not any(relevant[i, j] for j in cand):
            continue
        sc = np.minimum(bows[i][None, :], bows[cand]).sum(-1)
        order = np.argsort(-sc)
        total += 1
        if relevant[i, cand[order[0]]]:
            hits1 += 1
        if any(relevant[i, cand[o]] for o in order[:4]):
            hits4 += 1
    print(f"queries={total} precision@1={hits1/max(total,1):.3f} "
          f"recall@4={hits4/max(total,1):.3f}")

    # score-separation: relevant vs irrelevant mean L1 score
    rel_s, irr_s = [], []
    for i in range(n):
        for j in range(n):
            if abs(i - j) <= 6:
                continue
            s = np.minimum(bows[i], bows[j]).sum()
            (rel_s if relevant[i, j] else irr_s).append(s)
    print(f"mean score relevant={np.mean(rel_s):.4f} "
          f"irrelevant={np.mean(irr_s):.4f} "
          f"separation={np.mean(rel_s)/max(np.mean(irr_s),1e-9):.2f}x")

    # --- tree-vocabulary comparison + candidate-set overlap vs LSH ---
    def eval_bows(bows_x, name):
        h1 = h4 = tot = 0
        top4 = {}
        for i in range(n):
            cand = [j for j in range(n) if abs(i - j) > 6]
            sc = np.minimum(bows_x[i][None, :], bows_x[cand]).sum(-1)
            order = np.argsort(-sc)
            top4[i] = {cand[o] for o in order[:4]}
            if not any(relevant[i, j] for j in cand):
                continue
            tot += 1
            h1 += bool(relevant[i, cand[order[0]]])
            h4 += any(relevant[i, cand[o]] for o in order[:4])
        print(f"{name}: precision@1={h1/max(tot,1):.3f} "
              f"recall@4={h4/max(tot,1):.3f}")
        return top4

    top4_lsh = eval_bows(bows, "LSH-4096 (default)")
    for vp in voc_paths:
        voc = orbvoc.load_text(vp)
        bow.set_vocabulary(voc)
        try:
            bows_v = np.stack([np.asarray(bow.bow_vector(f.desc, f.valid))
                               for f in feats])
        finally:
            bow.set_vocabulary(None)
        t4 = eval_bows(bows_v, f"ORBvoc k={voc.k} L={voc.L} "
                               f"({voc.n_words} words, {vp})")
        overlap = np.mean([len(t4[i] & top4_lsh[i]) / 4.0 for i in range(n)])
        print(f"  candidate-set overlap@4 vs LSH: {overlap:.2f}")


if __name__ == "__main__":
    main()
