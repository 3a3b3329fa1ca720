"""Randomized median-selection property test, modeled on the reference's
qsort_test.go:26-53: for shuffled 1..n arrays the median must equal the
analytic expectation for every size."""

import numpy as np
import jax.numpy as jnp

from nightlight_tpu.ops.stats import first_quartile_sorted, median_sorted


class TestMedianSelectionProperty:
    # a spread of sizes rather than the reference's 1..1000 sweep: each size
    # compiles a fresh device sort, which would dominate suite runtime
    SIZES = [1, 2, 3, 4, 5, 6, 7, 8, 9, 15, 16, 17, 31, 32, 33,
             63, 64, 100, 127, 128, 129, 255, 256, 999, 1000]

    def test_permutations_many_sizes(self, rng):
        for n in self.SIZES:
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
