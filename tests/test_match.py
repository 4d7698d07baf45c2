"""Matcher and stereo-association tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vi_slam_tpu.ops.hamming import (
    hamming_matrix,
    hamming_pairwise_packed,
    popcount_u32,
)
from vi_slam_tpu.ops.match import (
    match_descriptors,
    resolve_duplicate_targets,
    rotation_consistency_mask,
    search_by_projection,
    Matches,
)


def random_desc(key, n):
    return jax.random.randint(
        key, (n, 8), 0, 2**32, dtype=jnp.uint32
    )


class TestHamming:
    def test_popcount(self):
        xs = np.asarray([0, 1, 0xFFFFFFFF, 0x80000000, 0x0F0F0F0F], dtype=np.uint32)
        expect = [0, 1, 32, 1, 16]
        np.testing.assert_array_equal(
            np.asarray(popcount_u32(jnp.asarray(xs))), expect
        )

    def test_matrix_matches_packed(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        d1 = random_desc(k1, 64)
        d2 = random_desc(k2, 48)
        D = np.asarray(hamming_matrix(d1, d2))
        # brute-force check a few entries via packed popcount
        for i in [0, 13, 63]:
            for j in [0, 21, 47]:
                expect = int(hamming_pairwise_packed(d1[i], d2[j]))
                assert D[i, j] == expect

    def test_zero_distance_diag(self):
        d = random_desc(jax.random.PRNGKey(1), 32)
        D = np.asarray(hamming_matrix(d, d))
        np.testing.assert_array_equal(np.diag(D), 0)


class TestMatch:
    def test_identity_matching(self):
        d = random_desc(jax.random.PRNGKey(2), 128)
        valid = jnp.ones((128,), bool)
        m = match_descriptors(d, d, valid, valid, max_dist=10, ratio=1.0)
        # self-match should be perfect (dist 0); random second-best far
        assert bool(jnp.all(m.idx == jnp.arange(128)))
        assert bool(jnp.all(m.dist == 0))
        assert int(m.ok.sum()) == 128

    def test_permuted_matching(self):
        d = random_desc(jax.random.PRNGKey(3), 100)
        perm = jax.random.permutation(jax.random.PRNGKey(4), 100)
        valid = jnp.ones((100,), bool)
        m = match_descriptors(d, d[perm], valid, valid, max_dist=10, ratio=1.0)
        inv = jnp.argsort(perm)
        assert bool(jnp.all(m.idx == inv))

    def test_invalid_masked_out(self):
        d = random_desc(jax.random.PRNGKey(5), 64)
        v1 = jnp.ones((64,), bool).at[:10].set(False)
        m = match_descriptors(d, d, v1, jnp.ones((64,), bool), max_dist=10)
        assert not bool(m.ok[:10].any())

    def test_rotation_consistency(self):
        n = 200
        ok = jnp.ones((n,), bool)
        # 90% of matches at rotation 0.3 rad, 10% scattered
        key = jax.random.PRNGKey(6)
        dangle = jnp.where(
            jnp.arange(n) < 180,
            0.3 + 0.01 * jax.random.normal(key, (n,)),
            jax.random.uniform(key, (n,), minval=-3.0, maxval=3.0),
        )
        kept = rotation_consistency_mask(dangle, ok)
        assert bool(kept[:180].all())
        assert int(kept[180:].sum()) < 10

    def test_resolve_duplicates(self):
        idx = jnp.asarray([3, 3, 5, 7], dtype=jnp.int32)
        dist = jnp.asarray([10, 4, 2, 9], dtype=jnp.int32)
        ok = jnp.ones((4,), bool)
        m = resolve_duplicate_targets(Matches(idx, dist, ok), n_targets=10)
        np.testing.assert_array_equal(np.asarray(m.ok), [False, True, True, True])


class TestSearchByProjection:
    def test_window_constraint(self):
        key = jax.random.PRNGKey(7)
        n = 64
        d = random_desc(key, n)
        xy = jax.random.uniform(key, (n, 2), minval=0.0, maxval=500.0)
        level = jnp.zeros((n,), jnp.int32)
        valid = jnp.ones((n,), bool)
        scales = jnp.asarray([1.2 ** l for l in range(8)], jnp.float32)
        # project exactly onto the keypoints: perfect self-match
        m = search_by_projection(
            xy, level, d, valid, xy, level, d, valid,
            radius=5.0, level_scales=scales, ratio=1.0,
        )
        assert bool(jnp.all(m.idx == jnp.arange(n)))
        assert int(m.ok.sum()) == n
        # shift projections far away: nothing within window
        m2 = search_by_projection(
            xy + 100.0, level, d, valid, xy, level, d, valid,
            radius=5.0, level_scales=scales, ratio=1.0,
        )
        assert int(m2.ok.sum()) == 0
