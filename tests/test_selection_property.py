"""Randomized median-selection property test, modeled on the reference's
qsort_test.go:26-53: for shuffled 1..n arrays the median must equal the
analytic expectation for every size."""

import numpy as np
import jax.numpy as jnp

from nightlight_tpu.ops.stats import first_quartile_sorted, median_sorted


class TestMedianSelectionProperty:
    def test_permutations_all_sizes(self, rng):
        for n in range(1, 201):
            arr = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
            med = float(median_sorted(jnp.sort(jnp.asarray(arr))))
            # analytic: median of 1..n
            expected = (n + 1) / 2.0
            assert med == expected, (n, med)

    def test_first_quartile_matches_reference_index(self, rng):
        # QSelectFirstQuartileFloat32 = (n>>2)+1 th lowest = sorted[n>>2]
        for n in (4, 7, 16, 33, 100):
            arr = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
            q = float(first_quartile_sorted(jnp.sort(jnp.asarray(arr))))
            assert q == float(np.sort(arr)[n >> 2]), n
