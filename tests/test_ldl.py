"""Sparse tree-structured LDL^T (physics/ldl_pallas.py) vs dense solves."""
import numpy as np
import jax.numpy as jnp
import pytest

from egopose_tpu.physics import parse_mjcf, build_model
from egopose_tpu.physics import ldl_pallas as LDL

XML = "assets/mujoco_models/humanoid_1205_v1.xml"


@pytest.fixture(scope="module")
def model():
    return build_model(parse_mjcf(XML), dtype=jnp.float64)


def test_anc_lists_nest(model):
    """The compressed layout relies on ancestor lists nesting along chains:
    anc[anc[d][s]] == anc[d][:s] for every dof and slot."""
    anc = LDL.dof_anc_lists(model.anc_mask)
    assert len(anc) == 58 and anc[0] == ()
    for d in range(len(anc)):
        for s, j in enumerate(anc[d]):
            assert anc[j] == anc[d][:s], (d, s, j)
    # root free joint is fully coupled
    assert anc[5] == (0, 1, 2, 3, 4)


def test_ldl_solve_matches_dense(model):
    """Factor+solve a random diagonally-dominant matrix with the humanoid's
    tree sparsity; compare against numpy dense solve, multi-lane, multi-rhs."""
    anc = LDL.dof_anc_lists(model.anc_mask)
    segs = LDL.anc_segments(anc)
    n, L, r = len(anc), 4, 5
    rng = np.random.RandomState(0)
    mask = np.asarray(model.anc_mask) > 0
    mask = (mask | mask.T | np.eye(n, dtype=bool))
    a = rng.randn(n, n, L)
    a = a + a.transpose(1, 0, 2)
    a = a * mask[:, :, None] + 2.0 * n * np.eye(n)[:, :, None]
    b = rng.randn(n, r, L)

    mrows, dvals = LDL.rows_from_dense(jnp.asarray(a), segs, n)
    invd = LDL.ldl_factor(mrows, dvals, anc)
    xv = [jnp.asarray(b[d]) for d in range(n)]
    LDL.ldl_solve(mrows, invd, anc, xv)
    x = np.stack([np.asarray(v) for v in xv], axis=0)     # (n, r, L)

    for lane in range(L):
        ref = np.linalg.solve(a[:, :, lane], b[:, :, lane])
        np.testing.assert_allclose(x[:, :, lane], ref, rtol=1e-9, atol=1e-9)


def test_ldl_matches_crba_mass_matrix(model):
    """The structural claim behind the sparsity: entries of the CRBA mass
    matrix outside the ancestor mask are exactly zero."""
    from egopose_tpu.physics import engine as E
    rng = np.random.RandomState(1)
    qpos = jnp.asarray(np.concatenate([[0, 0, 0.9, 1, 0, 0, 0],
                                       0.3 * rng.randn(52)]))
    x = E.fk(model, qpos)
    mmat = E.crba(model, x)
    mask = np.asarray(model.anc_mask) > 0
    mask = mask | mask.T | np.eye(mask.shape[0], dtype=bool)
    off = np.asarray(mmat) * (~mask)
    assert np.abs(off).max() == 0.0


def test_ldl_substep_solve_chain(model):
    """The substep kernel's sparse branch, replayed at the value level:
    stable-PD solve + dynamics solve [dt*qfrc | J^T] via compressed LDL
    against the dense solves, on real CRBA matrices from _lane_prep."""
    import yaml
    import jax
    from egopose_tpu.physics import engine as E
    from egopose_tpu.physics import substep_pallas as SP

    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])

    rng = np.random.RandomState(7)
    B = 4
    qpos = np.tile(np.concatenate(
        [[0, 0, 0.85, 1, 0, 0, 0], 0.05 * rng.randn(52)]), (B, 1))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos = jnp.asarray(qpos + 0.01 * rng.randn(B, 59))
    qvel = 0.1 * jnp.asarray(rng.randn(B, 58))
    ctrl = 0.1 * jnp.asarray(rng.randn(B, 52))

    params = E.DEFAULT_CONTACT._replace(sparse_ldl=True)
    st = SP._build_static(model, params)
    assert st["sparse_ldl"] and len(st["anc_dofs"]) == 58
    ndc, masks, bodyc, cpc, treem, cppk = SP._packed_consts(st)
    prpk, pairc = SP._packed_pair_consts(st)
    C = SP._unpack_consts(st, jnp.asarray(ndc), jnp.asarray(masks),
                          jnp.asarray(bodyc), jnp.asarray(st["pdm"]),
                          jnp.asarray(cpc), jnp.asarray(treem),
                          jnp.asarray(cppk), jnp.asarray(prpk),
                          jnp.asarray(st["pdm_pair"]), jnp.asarray(pairc))
    zeros6 = jnp.zeros(6)
    jkd_full = jnp.broadcast_to(
        jnp.concatenate([zeros6, jkd])[:, None], (58, B))
    jkp_full = jnp.broadcast_to(
        jnp.concatenate([zeros6, jkp])[:, None], (58, B))
    mmat, bias, qfb, e, rhspd, jf, target, mu = SP._lane_prep(
        st, C, qpos.T, qvel.T, ctrl.T, jkp_full, jkd_full, jnp.float64)

    nd, dt, c3 = 58, st["dt"], 3 * st["k"]
    anc, segs = st["anc_dofs"], st["anc_segs"]

    # --- sparse chain exactly as the kernel branch wires it ---
    mr, dv = LDL.rows_from_dense(mmat, segs, nd)
    mr_pd = list(mr)
    d_pd = [dv[i] + dt * jkd_full[i:i + 1] for i in range(nd)]
    invd_pd = LDL.ldl_factor(mr_pd, d_pd, anc)
    xpd = [rhspd[i:i + 1] for i in range(nd)]
    LDL.ldl_solve(mr_pd, invd_pd, anc, xpd)
    qacc_pd = np.asarray(jnp.concatenate(xpd, axis=0))      # (nd,B)

    jt = jnp.stack([jf[i] for i in range(c3)], axis=1)      # (nd,c3,B)
    qfrc = jnp.asarray(rng.randn(58, B))                    # any rhs works
    d_dyn = [dv[i] + dt * C["damping"][i:i + 1] for i in range(nd)]
    invd_dyn = LDL.ldl_factor(mr, d_dyn, anc)
    xv = [jnp.concatenate([(qfrc * dt)[i:i + 1], jt[i]], axis=0)
          for i in range(nd)]
    LDL.ldl_solve(mr, invd_dyn, anc, xv)
    sol = np.stack([np.asarray(v) for v in xv], axis=0)     # (nd,1+c3,B)

    # --- dense references ---
    for lane in range(B):
        a_pd = np.asarray(mmat[:, :, lane]) + dt * np.diag(
            np.asarray(jkd_full[:, lane]))
        ref_pd = np.linalg.solve(a_pd, np.asarray(rhspd[:, lane]))
        np.testing.assert_allclose(qacc_pd[:, lane], ref_pd,
                                   rtol=1e-8, atol=1e-8)
        a_dy = np.asarray(mmat[:, :, lane]) + dt * np.diag(
            np.asarray(C["damping"][:, 0]))
        rhs = np.concatenate([dt * np.asarray(qfrc[:, lane])[:, None],
                              np.asarray(jt[:, :, lane])], axis=1)
        ref_dy = np.linalg.solve(a_dy, rhs)
        np.testing.assert_allclose(sol[:, :, lane], ref_dy,
                                   rtol=1e-8, atol=1e-8)


def test_forward_only_contact_path_matches_full(model):
    """The substep kernel's forward-only contact branch, replayed at the
    value level: Y = L^-T J^T via ldl_tsolve, Delassus assembled from the 6
    symmetric blocks (Y^T D^-1 Y, linalg_pallas._contact_sweep_sym), and
    v_new = v_pred + L^-1 D^-1 (Y lam) -- against the dense W = Minv J^T
    accumulation and v_new = v_pred + W lam it replaces."""
    import yaml
    from egopose_tpu.physics import engine as E
    from egopose_tpu.physics import substep_pallas as SP
    from egopose_tpu.physics import linalg_pallas as LIN

    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])

    rng = np.random.RandomState(13)
    B = 4
    qpos = np.tile(np.concatenate(
        [[0, 0, 0.82, 1, 0, 0, 0], 0.05 * rng.randn(52)]), (B, 1))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos = jnp.asarray(qpos + 0.01 * rng.randn(B, 59))
    qvel = 0.1 * jnp.asarray(rng.randn(B, 58))
    ctrl = 0.1 * jnp.asarray(rng.randn(B, 52))

    params = E.DEFAULT_CONTACT._replace(sparse_ldl=True)
    st = SP._build_static(model, params)
    ndc, masks, bodyc, cpc, treem, cppk = SP._packed_consts(st)
    prpk, pairc = SP._packed_pair_consts(st)
    C = SP._unpack_consts(st, jnp.asarray(ndc), jnp.asarray(masks),
                          jnp.asarray(bodyc), jnp.asarray(st["pdm"]),
                          jnp.asarray(cpc), jnp.asarray(treem),
                          jnp.asarray(cppk), jnp.asarray(prpk),
                          jnp.asarray(st["pdm_pair"]), jnp.asarray(pairc))
    zeros6 = jnp.zeros(6)
    jkd_full = jnp.broadcast_to(
        jnp.concatenate([zeros6, jkd])[:, None], (58, B))
    jkp_full = jnp.broadcast_to(
        jnp.concatenate([zeros6, jkp])[:, None], (58, B))
    mmat, bias, qfb, e, rhspd, jf, target, mu = SP._lane_prep(
        st, C, qpos.T, qvel.T, ctrl.T, jkp_full, jkd_full, jnp.float64)

    nd, dt, k = 58, st["dt"], st["k"]
    c3 = int(jf.shape[0])            # 3k friction rows + kp pair rows
    anc, segs = st["anc_dofs"], st["anc_segs"]
    iters, relax = params.iters, params.relax

    jt = jnp.stack([jf[i] for i in range(c3)], axis=1)      # (nd,c3,B)
    qfrc = jnp.asarray(rng.randn(58, B))

    # --- forward-only sparse branch exactly as the kernel wires it ---
    mr, dv = LDL.rows_from_dense(mmat, segs, nd)
    d_dyn = [dv[i] + dt * C["damping"][i:i + 1] for i in range(nd)]
    invd_dyn = LDL.ldl_factor(mr, d_dyn, anc)
    xv = [jnp.concatenate([(qfrc * dt)[i:i + 1], jt[i]], axis=0)
          for i in range(nd)]
    LDL.ldl_tsolve(mr, anc, xv)
    x0 = [xv[i][0:1] for i in range(nd)]
    LDL.ldl_fsolve(mr, invd_dyn, anc, x0)
    qacc_col = jnp.concatenate(x0, axis=0)
    v_pred = (qvel.T + qacc_col)[:, None, :]
    y_val = jnp.stack([xv[i][1:] for i in range(nd)], axis=0)  # (nd,c3,B)

    lam = LIN._contact_sweep_sym(
        jf, target[:, None, :], mu[:, None, :], y_val, v_pred,
        invd_dyn, nd, c3, k, iters, relax, sup_segs=st["sup_segs"])
    u = jnp.sum(y_val * lam[:, 0, :][None], axis=1, keepdims=True)
    uv = [u[i, :, :] for i in range(nd)]
    LDL.ldl_fsolve(mr, invd_dyn, anc, uv)
    v_new = np.asarray(qvel.T + qacc_col + jnp.concatenate(uv, axis=0))

    # --- dense reference: full W = Minv J^T, G = J W, same sweep ---
    for lane in range(B):
        a_dy = np.asarray(mmat[:, :, lane]) + dt * np.diag(
            np.asarray(C["damping"][:, 0]))
        w_ref = np.linalg.solve(a_dy, np.asarray(jt[:, :, lane]))
        g_ref = np.asarray(jf[:, :, lane]) @ w_ref
        # (1) the symmetric-block Delassus equals the dense one
        g_sym = np.zeros((c3, c3))
        y_l = np.asarray(y_val[:, :, lane])
        for d in range(nd):
            g_sym += np.outer(float(np.asarray(invd_dyn[d][0, lane]))
                              * y_l[d], y_l[d])
        np.testing.assert_allclose(g_sym, g_ref, rtol=1e-8, atol=1e-10)
        # (2) end-to-end velocity equals the dense-W sweep's
        vp = np.asarray(v_pred[:, 0, lane])
        bhat = np.asarray(jf[:, :, lane]) @ vp - np.asarray(target[:, lane])
        diag = np.abs(g_ref).sum(1) + 1e-9
        lam_ref = np.zeros(c3)
        for _ in range(iters):
            g = g_ref @ lam_ref + bhat
            lam_ref = lam_ref - relax * g / diag
            ln = np.maximum(lam_ref[2 * k:3 * k], 0.0)
            lim = np.asarray(mu[:, lane]) * ln
            lam_ref = np.concatenate([
                np.clip(lam_ref[:k], -lim, lim),
                np.clip(lam_ref[k:2 * k], -lim, lim), ln,
                np.maximum(lam_ref[3 * k:], 0.0)])
        v_ref = vp + w_ref @ lam_ref
        np.testing.assert_allclose(v_new[:, lane], v_ref,
                                   rtol=1e-7, atol=1e-9)


def test_compressed_prep_matches_dense_mmat(model):
    """_lane_prep(compressed=True) builds the compressed rows directly from
    the CRBA inner products; they must equal the dense mmat's entries at the
    ancestor slots bitwise (same products, same summation order)."""
    import yaml
    from egopose_tpu.physics import engine as E
    from egopose_tpu.physics import substep_pallas as SP

    cfg = yaml.safe_load(open("config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = jnp.array(np.array(jp[1], dtype=float) * cfg["jkp_multiplier"])
    jkd = jnp.array(np.array(jp[2], dtype=float) * cfg["jkp_multiplier"])

    rng = np.random.RandomState(11)
    B = 3
    qpos = np.tile(np.concatenate(
        [[0, 0, 0.85, 1, 0, 0, 0], 0.05 * rng.randn(52)]), (B, 1))
    qpos[:, 3:7] /= np.linalg.norm(qpos[:, 3:7], axis=1, keepdims=True)
    qpos = jnp.asarray(qpos + 0.01 * rng.randn(B, 59))
    qvel = 0.1 * jnp.asarray(rng.randn(B, 58))
    ctrl = 0.1 * jnp.asarray(rng.randn(B, 52))

    st = SP._build_static(model, E.DEFAULT_CONTACT._replace(sparse_ldl=True))
    ndc, masks, bodyc, cpc, treem, cppk = SP._packed_consts(st)
    prpk, pairc = SP._packed_pair_consts(st)
    C = SP._unpack_consts(st, jnp.asarray(ndc), jnp.asarray(masks),
                          jnp.asarray(bodyc), jnp.asarray(st["pdm"]),
                          jnp.asarray(cpc), jnp.asarray(treem),
                          jnp.asarray(cppk), jnp.asarray(prpk),
                          jnp.asarray(st["pdm_pair"]), jnp.asarray(pairc))
    jkd_full = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(6), jkd])[:, None], (58, B))
    jkp_full = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(6), jkp])[:, None], (58, B))
    args = (st, C, qpos.T, qvel.T, ctrl.T, jkp_full, jkd_full, jnp.float64)

    dense = SP._lane_prep(*args)[0]                      # (nd,nd,B)
    mrows, dvals = SP._lane_prep(*args, compressed=True)[0]

    anc = st["anc_dofs"]
    for d in range(58):
        np.testing.assert_array_equal(
            np.asarray(dvals[d][0]), np.asarray(dense[d, d, :]),
            err_msg=f"diagonal {d}")
        if anc[d]:
            ref = np.stack([np.asarray(dense[d, j, :]) for j in anc[d]])
            np.testing.assert_array_equal(np.asarray(mrows[d]), ref,
                                          err_msg=f"row {d}")
    # support segments: exactly the dofs with any contact-candidate mass
    # (floor points or self-collision pairs)
    sup = sorted({d for (a, b) in st["sup_segs"] for d in range(a, b)})
    pdm = np.concatenate([np.asarray(st["pdm"]),
                          np.abs(np.asarray(st["pdm_pair"]))], axis=1)
    assert sup == sorted(np.where(pdm.sum(1) > 0)[0].tolist())
