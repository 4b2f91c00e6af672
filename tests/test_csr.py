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


def test_csr_feeds_direct_solver_cross_check():
    """The CSR layer's reason to exist (qdldl/sqp.cuh:148-166): pack a REAL
    Schur system through the lower-triangle pattern, hand it to a sparse LDL-
    style direct factorization (scipy splu, standing in for qdldl), and check
    the solution against btd_ldl_solve and PCG."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from mpcgpu_tpu.config import CostConfig
    from mpcgpu_tpu.models import iiwa14
    from mpcgpu_tpu.ops.ldl import btd_ldl_solve
    from mpcgpu_tpu.ops.pcg import pcg_solve
    from mpcgpu_tpu.ops.schur import form_schur_system
    from mpcgpu_tpu.solver.kkt import build_kkt
    from mpcgpu_tpu.utils.trajfiles import load_eepos_traj, load_xu_traj

    N, n = 12, 14
    model = iiwa14(dtype=jnp.float32)
    cost = CostConfig.for_knots(N)
    xu = jnp.asarray(load_xu_traj("0_0")[:N], jnp.float32)
    xu = xu + 0.02 * jax.random.normal(jax.random.PRNGKey(0), xu.shape, jnp.float32)
    ee = jnp.asarray(load_eepos_traj("0_0")[:N], jnp.float32)
    kkt = build_kkt(model, cost, xu, xu[0, :n], ee, 1 / 64.0)
    schur = form_schur_system(kkt, 1e-3)

    # pack the lower triangle via the CSR layer, then let scipy see the full
    # symmetric matrix: A = L + L^T - diag(L)
    col_ptr, row_ind = btd_lower_csc_pattern(n, N)
    vals = btd_lower_csc_values(np.asarray(schur.S, np.float64))
    L = sp.csc_matrix((vals, row_ind, col_ptr), shape=(N * n, N * n))
    A = L + L.T - sp.diags(L.diagonal())

    g = np.asarray(schur.gamma, np.float64).ravel()
    x_scipy = spla.splu(A.tocsc()).solve(g)

    x_ldl = np.asarray(
        btd_ldl_solve(schur.S, schur.gamma), np.float64).ravel()
    pcg = pcg_solve(schur.S, schur.Pinv, schur.gamma,
                    jnp.zeros_like(schur.gamma), max_iter=500, exit_tol=1e-12)
    x_pcg = np.asarray(pcg.lam, np.float64).ravel()

    scale = np.abs(x_scipy).max()
    np.testing.assert_allclose(x_ldl, x_scipy, atol=2e-4 * scale)
    np.testing.assert_allclose(x_pcg, x_scipy, atol=2e-3 * scale)
