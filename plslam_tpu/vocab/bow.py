"""Place recognition: bag-of-binary-words as dense matmul scoring.

TPU-native replacement for DBoW2 + KeyFrameDatabase
(`Thirdparty/DBoW2/TemplatedVocabulary.h`, `src/KeyFrameDatabase.cc`).

The reference quantizes descriptors down a learned k-ary vocabulary tree and
scores via an inverted file. Here word assignment is locality-sensitive
hashing of the 256-bit descriptor (`n_bits` fixed random bit positions ->
word id), frame signatures are L1-normalized tf histograms, and
"inverted-file scoring" is ONE (K, W) x (W,) matmul — on the MXU the dense
product IS the fast path, no data structure needed.  The similarity is the
DBoW2 L1 score: s(v, w) = 1 - 0.5 * |v - w|_1 (`ScoringObject.cpp`), which
equals sum(min(v_i, w_i)) for L1-normalized vectors — implemented via the
min-form so it stays a reduction.

No vocabulary file is required (the reference needs the 140MB ORBvoc);
word assignment is deterministic from a seed.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_WORDS_BITS = 12            # 4096 words
N_WORDS = 1 << N_WORDS_BITS


def _make_bit_selection(seed: int = 271828) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.choice(256, size=N_WORDS_BITS, replace=False).astype(np.int32)


BIT_SEL = _make_bit_selection()


# Optional drop-in vocabulary (DBoW2 ORBvoc text format, `orbvoc.py`):
# when set, word assignment + weighting go through the loaded tree instead
# of the LSH default. Must be set BEFORE any MapState is allocated (the
# kf_bow width is N_WORDS at allocation time).
_VOCAB = None


def set_vocabulary(voc) -> None:
    """Install an `orbvoc.OrbVocabulary` (or None to restore LSH words)."""
    global _VOCAB, N_WORDS
    _VOCAB = voc
    N_WORDS = voc.n_words if voc is not None else (1 << N_WORDS_BITS)


def words_of(desc_bits):
    """(N, 256) {0,1} -> (N,) int32 word ids (LSH, or vocabulary tree)."""
    if _VOCAB is not None:
        return _VOCAB.words_of(desc_bits)
    sel = desc_bits[..., jnp.asarray(BIT_SEL)].astype(jnp.int32)  # (N, 12)
    weights = (1 << jnp.arange(N_WORDS_BITS, dtype=jnp.int32))
    return jnp.sum(sel * weights, axis=-1)


def bow_vector(desc_bits, valid):
    """(N,256),(N,) -> (N_WORDS,) L1-normalized (tf or tf-idf) histogram."""
    if _VOCAB is not None:
        return _VOCAB.bow_vector(desc_bits, valid)
    w = words_of(desc_bits)
    hist = jnp.zeros((N_WORDS,), jnp.float32).at[w].add(valid.astype(jnp.float32))
    return hist / jnp.maximum(hist.sum(), 1e-9)


def l1_score(v, W):
    """DBoW2 L1 similarity of v (N_WORDS,) against rows of W (K, N_WORDS):
    s = sum_i min(v_i, w_i) in [0, 1]."""
    return jnp.sum(jnp.minimum(v[None, :], W), axis=-1)


def detect_candidates(query_bow, kf_bows, kf_mask, exclude_mask,
                      min_score, top_k: int = 8):
    """`KeyFrameDatabase::DetectLoopCandidates` semantics
    (`src/KeyFrameDatabase.cc:76-197`) in dense form: score all keyframes,
    drop excluded (covisible) ones, keep those >= min_score, return the
    top-k ids + scores (padded with -1)."""
    scores = l1_score(query_bow, kf_bows)
    ok = kf_mask & ~exclude_mask & (scores >= min_score)
    k = min(top_k, scores.shape[0])
    vals, idx = jax.lax.top_k(jnp.where(ok, scores, -1.0), k)
    return jnp.where(vals > 0, idx, -1), vals
