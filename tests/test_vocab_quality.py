"""Vocabulary discriminativeness on REAL photographic imagery (VERDICT
round-1 item 10): the 12-bit LSH bag-of-words must rank ground-truth
viewpoint-overlapping frames above non-overlapping ones on natural image
content. The scene tiles ONE photo over every surface, so global appearance
is maximally self-similar — the hardest case for tf-histogram retrieval.

Measured (scripts/vocab_probe.py, grace_hopper photo scene, 36 views):
precision@1 = 1.00, recall@4 = 1.00, relevant/irrelevant score separation
1.19x. The thresholds below leave margin."""
import numpy as np
import jax
import jax.numpy as jnp


def test_bow_retrieval_on_photo_imagery():
    from plslam_tpu.datasets import synthetic, textured
    from plslam_tpu.ops import extract
    from plslam_tpu.vocab import bow

    scene = textured.make_photo_scene(seed=3)
    n = 24
    Ts = synthetic.trajectory(n, "loop", amplitude=2.2)
    frames = [synthetic.render(scene, T) for T in Ts]

    cfgE = extract.ExtractorConfig(n_features=512, n_levels=3)
    ext = jax.jit(lambda im: extract.extract_points(im, cfgE))
    bows = []
    for f in frames:
        feats = ext(jnp.asarray(f))
        bows.append(np.asarray(bow.bow_vector(feats.desc, feats.valid)))
    bows = np.stack(bows)

    C = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])
    Z = np.stack([T[:3, :3].T @ np.array([0, 0, 1.0]) for T in Ts])
    ang = np.arccos(np.clip(Z @ Z.T, -1, 1))
    dist = np.linalg.norm(C[:, None] - C[None, :], axis=-1)
    relevant = (ang < 0.25) & (dist < 0.6)

    hits1 = total = 0
    rel_s, irr_s = [], []
    for i in range(n):
        cand = [j for j in range(n) if abs(i - j) > 4]
        if not cand:
            continue
        sc = np.minimum(bows[i][None, :], bows[cand]).sum(-1)
        for j, s in zip(cand, sc):
            (rel_s if relevant[i, j] else irr_s).append(s)
        if not any(relevant[i, j] for j in cand):
            continue
        total += 1
        if relevant[i, cand[int(np.argmax(sc))]]:
            hits1 += 1

    assert total >= 8, f"eval too small ({total} queries)"
    precision1 = hits1 / total
    separation = np.mean(rel_s) / max(np.mean(irr_s), 1e-9)
    assert precision1 >= 0.85, f"precision@1 {precision1:.2f}"
    assert separation >= 1.08, f"score separation {separation:.3f}"
