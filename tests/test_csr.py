"""CSR/CSC packing parity with the reference's closed-form layout
(utils/csr.cuh; nnz formula qdldl/sqp.cuh:148)."""

import numpy as np

from mpcgpu_tpu.ops.csr import btd_lower_csc_pattern, btd_lower_csc_values, btd_nnz_lower


def test_lower_csc_roundtrip():
    N, n = 6, 4
    rng = np.random.default_rng(0)
    S = np.zeros((N, 3, n, n))
    for k in range(N):
        A = rng.standard_normal((n, n))
        S[k, 1] = A + A.T
        if k > 0:
            S[k, 0] = rng.standard_normal((n, n))
    for k in range(N - 1):
        S[k, 2] = S[k + 1, 0].T

    col_ptr, row_ind = btd_lower_csc_pattern(n, N)
    vals = btd_lower_csc_values(S)
    assert col_ptr[-1] == len(row_ind) == len(vals) == btd_nnz_lower(n, N)

    # reconstruct dense lower triangle and compare
    dim = N * n
    L = np.zeros((dim, dim))
    for col in range(dim):
        for p in range(col_ptr[col], col_ptr[col + 1]):
            L[row_ind[p], col] = vals[p]
    dense = np.zeros((dim, dim))
    for k in range(N):
        dense[k * n : (k + 1) * n, k * n : (k + 1) * n] = S[k, 1]
        if k > 0:
            dense[k * n : (k + 1) * n, (k - 1) * n : k * n] = S[k, 0]
    np.testing.assert_allclose(L, np.tril(dense))
