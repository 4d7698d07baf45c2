"""Keyframe place-recognition database — inverted-file equivalent.

Semantic reference: `KeyFrameDatabase`
(`/root/reference/src/datastructures/keyframedatabase.cpp` — `add` :21,
`DetectLoopCandidates` :82, `DetectRelocalizationCandidates` :707,
`DetectNBestCandidates` :579; inverted file word->KF list
`keyframedatabase.h:63`).

TPU redesign: the inverted file becomes a dense (K, W) BoW matrix; "KFs
sharing words" is one masked matmul, scoring is a batched L1-min reduce,
and the covisibility-group accumulation (the reference's word-voting +
group-score pass) runs vmapped over a fixed candidate cap. Queries are
two jitted programs with a fixed-size candidate list between them — no
inverted-file pointer chasing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.retrieval.vocabulary import score_l1
from vi_slam_tpu.slam_map.state import MapState


class DBState(NamedTuple):
    bow: jnp.ndarray  # (K, W) float32 — L1-normalized TF-IDF per keyframe
    valid: jnp.ndarray  # (K,) bool


def allocate(max_keyframes: int, n_words: int) -> DBState:
    return DBState(
        bow=jnp.zeros((max_keyframes, n_words), jnp.float32),
        valid=jnp.zeros((max_keyframes,), bool),
    )


@jax.jit
def add(db: DBState, slot: jnp.ndarray, bow_vec: jnp.ndarray) -> DBState:
    return DBState(
        bow=db.bow.at[slot].set(bow_vec.astype(db.bow.dtype)),
        valid=db.valid.at[slot].set(True),
    )


@jax.jit
def remove(db: DBState, slot: jnp.ndarray) -> DBState:
    return DBState(
        bow=db.bow.at[slot].set(0.0), valid=db.valid.at[slot].set(False)
    )


@partial(jax.jit, static_argnames=("n_cand",))
def _stage1(
    db: DBState,
    query_bow: jnp.ndarray,
    exclude: jnp.ndarray,
    min_score: jnp.ndarray,
    n_cand: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Word-sharing + score filter (DetectLoopCandidates first half:
    common-word counting keyframedatabase.cpp:96-150, 0.8*max threshold,
    minScore gate). Returns (cand_ids, cand_scores, common_words)."""
    q_has = query_bow > 0
    common = jnp.sum(
        jnp.where(q_has[None, :] & (db.bow > 0), 1.0, 0.0), axis=-1
    )
    ok = db.valid & (~exclude)
    common = jnp.where(ok, common, 0.0)
    max_common = jnp.max(common)
    th_words = 0.8 * max_common
    scores = score_l1(query_bow, db.bow)
    pass_mask = ok & (common > th_words) & (scores >= min_score)
    ranked = jnp.where(pass_mask, scores, -1.0)
    top_scores, top_ids = jax.lax.top_k(ranked, n_cand)
    top_ids = jnp.where(top_scores > 0, top_ids, -1)
    return top_ids.astype(jnp.int32), top_scores, common


@partial(jax.jit, static_argnames=("group_size",))
def _stage2(
    db: DBState,
    state: MapState,
    query_bow: jnp.ndarray,
    cand_ids: jnp.ndarray,
    cand_scores: jnp.ndarray,
    group_size: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Covisibility-group accumulation (DetectLoopCandidates second half,
    keyframedatabase.cpp:152-200): each candidate's score is accumulated
    over its top covisible neighbors; winners are the best KF of each
    group with accScore > 0.75 * best."""
    K = db.valid.shape[0]
    scores_all = score_l1(query_bow, db.bow)  # (K,)
    word_share = jnp.sum(
        jnp.where((query_bow > 0)[None, :] & (db.bow > 0), 1.0, 0.0), axis=-1
    )

    def per_cand(cid, cscore):
        safe = jnp.maximum(cid, 0)
        # shared-map-point counts vs all other KFs (covisibility row)
        mp = state.kf_mp[safe]
        has = mp >= 0
        mp_safe = jnp.where(has, mp, 0)
        obs_kf = state.mp_obs_kf[mp_safe]  # (N, P)
        w = jnp.where(has[:, None] & (obs_kf >= 0), 1.0, 0.0)
        covis = jax.ops.segment_sum(
            w.reshape(-1),
            jnp.clip(obs_kf.reshape(-1), 0, K - 1),
            num_segments=K,
        )
        covis = covis.at[safe].set(0.0)
        nw, nid = jax.lax.top_k(covis, min(group_size, K))
        neigh_ok = (nw > 0) & (word_share[nid] > 0) & db.valid[nid]
        neigh_scores = jnp.where(neigh_ok, scores_all[nid], 0.0)
        acc = cscore + jnp.sum(neigh_scores)
        # best KF within the group (candidate or neighbor)
        grp_scores = jnp.concatenate([cscore[None], neigh_scores])
        grp_ids = jnp.concatenate([safe[None], nid])
        best = jnp.argmax(grp_scores)
        return jnp.where(cid >= 0, acc, -1.0), grp_ids[best]

    acc_scores, best_ids = jax.vmap(per_cand)(cand_ids, cand_scores)
    th = 0.75 * jnp.max(acc_scores)
    keep = acc_scores > jnp.maximum(th, 0.0)
    out_ids = jnp.where(keep & (cand_ids >= 0), best_ids, -1)
    return out_ids.astype(jnp.int32), acc_scores


@partial(jax.jit, static_argnames=("n_cand",))
def _detect_fused(
    db: DBState,
    state: MapState,
    query_bow: jnp.ndarray,
    exclude: jnp.ndarray,
    strong_mask: jnp.ndarray,
    n_cand: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole loop-candidate query as ONE dispatch: the min-score gate
    (worst BoW similarity among strongly-covisible KFs,
    loopclosing.cpp:315), word-sharing stage 1 and covisibility-group
    stage 2 — a single host pull per keyframe instead of four (the
    per-query blocking round-trips dominated loop-closing cost on a
    tunnel-attached TPU: ~150 ms/KF -> ~40 ms/KF)."""
    scores = score_l1(query_bow, db.bow)
    ms = jnp.where(strong_mask & db.valid, scores, jnp.inf)
    has_strong = jnp.any(strong_mask & db.valid)
    min_score = jnp.where(
        has_strong,
        jnp.maximum(jnp.min(ms), 1e-3),
        jnp.asarray(0.015, scores.dtype),
    )
    ids, sc, _ = _stage1(db, query_bow, exclude, min_score, n_cand)
    out_ids, acc = _stage2(db, state, query_bow, ids, sc)
    return out_ids, acc


def _ordered_unique(ids, scores) -> np.ndarray:
    """Candidate ids sorted by accumulated score (best first), deduped
    preserving order (the reference returns candidates ranked by group
    score; callers try them in order)."""
    ids = np.asarray(ids)
    scores = np.asarray(scores)
    order = np.argsort(-scores)
    out, seen = [], set()
    for k in order:
        i = int(ids[k])
        if i >= 0 and i not in seen:
            seen.add(i)
            out.append(i)
    return np.asarray(out, np.int32)


class KeyFrameDatabase:
    """Host wrapper holding the device-resident BoW matrix."""

    def __init__(self, max_keyframes: int, n_words: int, n_cand: int = 16):
        self.db = allocate(max_keyframes, n_words)
        self.n_cand = n_cand

    def add(self, slot: int, bow_vec: jnp.ndarray) -> None:
        self.db = add(self.db, jnp.int32(slot), bow_vec)

    def remove(self, slot: int) -> None:
        self.db = remove(self.db, jnp.int32(slot))

    def detect_loop_candidates_fused(
        self,
        state: MapState,
        query_bow: jnp.ndarray,
        exclude: jnp.ndarray,
        strong_mask: jnp.ndarray,
    ) -> np.ndarray:
        """One-dispatch-one-pull loop query (see _detect_fused)."""
        out_ids, acc = _detect_fused(
            self.db, state, query_bow, exclude, strong_mask, self.n_cand
        )
        got = jax.device_get({"ids": out_ids, "acc": acc})
        return _ordered_unique(got["ids"], got["acc"])

    def detect_loop_candidates(
        self,
        state: MapState,
        query_bow: jnp.ndarray,
        exclude: jnp.ndarray,
        min_score: float,
    ) -> np.ndarray:
        """Loop candidates for a query BoW vector; `exclude` masks the query
        KF and its covisible set (DetectLoopCandidates contract). Returns
        unique candidate KF slots (np array, possibly empty)."""
        ids, scores, _ = _stage1(
            self.db, query_bow, exclude, jnp.float32(min_score), self.n_cand
        )
        if not bool(np.any(np.asarray(ids) >= 0)):
            return np.empty((0,), np.int32)
        out_ids, acc = _stage2(self.db, state, query_bow, ids, scores)
        return _ordered_unique(out_ids, acc)

    def detect_reloc_candidates(
        self, state: MapState, query_bow: jnp.ndarray
    ) -> np.ndarray:
        """Relocalization candidates (DetectRelocalizationCandidates
        semantics: no exclusion, no min-score gate)."""
        exclude = jnp.zeros_like(self.db.valid)
        ids, scores, _ = _stage1(
            self.db, query_bow, exclude, jnp.float32(-1.0), self.n_cand
        )
        if not bool(np.any(np.asarray(ids) >= 0)):
            return np.empty((0,), np.int32)
        out_ids, acc = _stage2(self.db, state, query_bow, ids, scores)
        return _ordered_unique(out_ids, acc)
