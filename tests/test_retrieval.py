"""Vocabulary + keyframe database tests (DBoW3-equivalent capability).

Checks: transform determinism and self-similarity of BoW scoring
(same-image score ~1, distinct random images score lower), IDF weighting,
and loop-candidate retrieval semantics on a synthetic map (the true
revisit wins; covisible neighbors of the query are excluded) —
keyframedatabase.cpp:82-200 behavior.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vi_slam_tpu.retrieval import database as kfdb
from vi_slam_tpu.retrieval import vocabulary as voc
from vi_slam_tpu.slam_map import state as map_state


def random_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, bits=8):
    """Flip `bits` random bits in each 256-bit descriptor."""
    out = desc.copy()
    for i in range(out.shape[0]):
        for _ in range(bits):
            b = rng.integers(0, 256)
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    train = random_desc(rng, 4000)
    image_ids = np.repeat(np.arange(20), 200)
    return voc.train_vocabulary(
        train, k=6, levels=3, iters=4, image_ids=image_ids, seed=1
    )


def test_transform_shapes_and_range(vocab):
    rng = np.random.default_rng(1)
    d = jnp.asarray(random_desc(rng, 128))
    words, nodes = voc.transform(vocab, d)
    assert words.shape == (128,)
    assert int(words.min()) >= 0 and int(words.max()) < vocab.n_words
    # node level = levels-3 = 0 -> k nodes
    assert int(nodes.max()) < vocab.k ** (max(vocab.levels - 3, 0) + 1)


def test_bow_scoring_discriminates(vocab):
    rng = np.random.default_rng(2)
    a = random_desc(rng, 300)
    a_noisy = perturb_desc(rng, a, bits=6)
    b = random_desc(rng, 300)
    valid = jnp.ones((300,), bool)

    def bow(d):
        w, _ = voc.transform(vocab, jnp.asarray(d))
        return voc.bow_vectors(w[None], valid[None], vocab.idf, vocab.n_words)[0]

    va, van, vb = bow(a), bow(a_noisy), bow(b)
    s_self = float(voc.score_l1(va, va[None])[0])
    s_noisy = float(voc.score_l1(va, van[None])[0])
    s_other = float(voc.score_l1(va, vb[None])[0])
    assert s_self == pytest.approx(1.0, abs=1e-4)
    assert s_noisy > s_other + 0.05


def test_loop_candidates_find_revisit(vocab):
    """KF 0..5 along a corridor; KF 6 revisits KF 1's scene. The database
    must propose KF 1 (not the query's own covisible neighbors)."""
    rng = np.random.default_rng(3)
    n_kf, n_feat = 8, 200
    scene = [random_desc(rng, n_feat) for _ in range(6)]
    descs = scene + [perturb_desc(rng, scene[1], bits=4)]  # KF6 ~ KF1

    state = map_state.allocate(n_kf, n_feat, 512, 4)
    db = kfdb.KeyFrameDatabase(n_kf, vocab.n_words, n_cand=8)
    valid = jnp.ones((n_feat,), bool)
    bows = []
    for i, d in enumerate(descs):
        w, _ = voc.transform(vocab, jnp.asarray(d))
        bv = voc.bow_vectors(w[None], valid[None], vocab.idf, vocab.n_words)[0]
        bows.append(bv)
        db.add(i, bv)
        state = state._replace(kf_valid=state.kf_valid.at[i].set(True))

    # covisibility: chain i ~ i+1 via shared map points
    mp_id = 0
    kf_mp = np.full((n_kf, n_feat), -1, np.int32)
    mp_obs_kf = np.full((512, 4), -1, np.int32)
    for i in range(6):
        for j in range(30):  # 30 shared points between i and i+1
            if i + 1 < 7:
                kf_mp[i, j] = mp_id
                kf_mp[i + 1, 30 + j] = mp_id
                mp_obs_kf[mp_id, 0] = i
                mp_obs_kf[mp_id, 1] = i + 1
                mp_id += 1
    state = state._replace(
        kf_mp=jnp.asarray(kf_mp), mp_obs_kf=jnp.asarray(mp_obs_kf)
    )

    # query = KF 6; exclude itself and covisible KF 5
    exclude = np.zeros((n_kf,), bool)
    exclude[6] = True
    exclude[5] = True
    cands = db.detect_loop_candidates(
        state, bows[6], jnp.asarray(exclude), min_score=0.01
    )
    assert 1 in cands.tolist()
    assert 6 not in cands.tolist() and 5 not in cands.tolist()


def test_vocab_save_load(tmp_path, vocab):
    p = str(tmp_path / "voc.npz")
    voc.save_vocabulary(p, vocab)
    v2 = voc.load_vocabulary(p)
    rng = np.random.default_rng(5)
    d = jnp.asarray(random_desc(rng, 64))
    w1, _ = voc.transform(vocab, d)
    w2, _ = voc.transform(v2, d)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
