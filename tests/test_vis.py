"""Visualization model family + trajectory viewer (headless: puppeting and
key-contract logic, no window)."""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.path.join(REPO, "assets", "mujoco_models")

EXPECTED_NQ = {
    "humanoid_1205_vis": 118,
    "humanoid_1205_vis_double_v1": 118,
    "humanoid_1205_vis_ghost_v1": 118,
    "humanoid_1205_vis_estimate_v1": 13 * 59,
    "humanoid_1205_vis_forecast_v1": 13 * 59,
    "humanoid_1205_vis_multi_v1": 20 * 59,
    "humanoid_1205_vis_single_v1": 59,
}


def test_vis_family_loads_with_reference_layouts():
    """Every vis variant + the template exist and load in MuJoCo C with the
    reference's qpos layout (N consecutive 59-dof humanoids, no actuators,
    contact disabled)."""
    import mujoco
    for name, nq in EXPECTED_NQ.items():
        path = os.path.join(MODELS, f"{name}.xml")
        assert os.path.exists(path), f"missing {name}.xml"
        m = mujoco.MjModel.from_xml_path(path)
        assert m.nq == nq, (name, m.nq)
        assert m.nu == 0
        assert m.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_CONTACT
        assert m.nmat > 0, f"{name}: common/materials.xml include missing"
    assert os.path.exists(os.path.join(MODELS, "template",
                                       "humanoid_template.xml"))


def test_orig_model_asset():
    """The legacy pre-v1 model (reference humanoid_1205_orig.xml, global
    coordinates) regenerated local-coords through physics/spec.py: same
    dof/actuator layout as v1 but the original geometry (zero Hips offset,
    0.03 head sphere, +-180 deg ranges everywhere)."""
    import mujoco
    from egopose_tpu.physics import parse_mjcf, build_model

    path = os.path.join(MODELS, "humanoid_1205_orig.xml")
    m = mujoco.MjModel.from_xml_path(path)
    assert (m.nq, m.nv, m.nu) == (59, 58, 52)
    spec = parse_mjcf(path)
    build_model(spec)  # engine accepts it end-to-end
    # distinct from v1: the orig Hips body sits at the world origin
    v1 = mujoco.MjModel.from_xml_path(
        os.path.join(MODELS, "humanoid_1205_v1.xml"))
    assert not np.allclose(m.body_pos[1], v1.body_pos[1])


def test_template_generation_roundtrip(tmp_path):
    """create_humanoid's template path: a skeleton written into the template
    still loads and keeps the template's option/defaults."""
    import mujoco
    from egopose_tpu.mocap import Skeleton
    from test_mocap import BVH_TEXT

    bvh_path = tmp_path / "fixture.bvh"
    bvh_path.write_text(BVH_TEXT)
    sk = Skeleton()
    sk.load_from_bvh(str(bvh_path))
    out = str(tmp_path / "gen.xml")
    sk.write_xml(out, template_fname=os.path.join(
        MODELS, "template", "humanoid_template.xml"))
    m = mujoco.MjModel.from_xml_path(out)
    assert m.nu > 0  # actuators filled into the template's <actuator/>
    assert abs(m.opt.timestep - 1.0 / 450.0) < 1e-9  # template option kept


def _viewer(model_name, algos):
    from egopose_tpu.envs.visual import TrajectoryViewer
    return TrajectoryViewer(os.path.join(MODELS, f"{model_name}.xml"), algos)


def _fake_results(t_len=12, n_takes=2, windows=None, seed=0):
    rng = np.random.RandomState(seed)
    res = {}
    for i in range(n_takes):
        shape = (t_len, 59) if windows is None else (windows, t_len, 59)
        pred = rng.randn(*shape) * 0.01
        orig = rng.randn(*shape) * 0.01
        pred[..., 3] = orig[..., 3] = 1.0  # unit-ish quats
        res[f"take_{i}"] = {"pred": pred, "orig": orig}
    return res


def test_viewer_double_puppeting():
    v = _viewer("humanoid_1205_vis_double_v1", [("em", _fake_results())])
    v.fr = 3
    v.update_pose()
    res = v.algos[0][1]["take_0"]
    np.testing.assert_allclose(v.data.qpos[:59], res["pred"][3])
    want_orig = res["orig"][3].copy()
    want_orig[0] += 1.0
    np.testing.assert_allclose(v.data.qpos[59:118], want_orig)


def test_viewer_multi_staggers_frames():
    v = _viewer("humanoid_1205_vis_multi_v1",
                [("em", _fake_results(t_len=300))])
    v.fr, v.mfr_int = 5, 10
    v.update_pose()
    pred = v.algos[0][1]["take_0"]["pred"]
    # copy 3 shows joint pose of frame 5 + 3*10 (root is re-anchored)
    np.testing.assert_allclose(v.data.qpos[3 * 59 + 7:4 * 59], pred[35, 7:])


def test_viewer_key_contract():
    import glfw
    res = _fake_results(windows=4)
    v = _viewer("humanoid_1205_vis_double_v1", [("em", res), ("sr", res)])
    v.key_callback(glfw.KEY_SPACE)
    assert v.paused
    v.key_callback(glfw.KEY_RIGHT)
    assert v.fr == 1
    v.key_callback(glfw.KEY_E)   # next forecast window
    assert v.traj_ind == 1 and v.fr == 0
    v.key_callback(glfw.KEY_Q)
    assert v.traj_ind == 0
    v.key_callback(glfw.KEY_2)   # select second result set
    assert v.algo_ind == 1
    v.key_callback(glfw.KEY_1)
    assert v.algo_ind == 0
    v.key_callback(glfw.KEY_C)
    assert v.take_ind == 1
    v.key_callback(glfw.KEY_0)
    assert v.show_gt
    v.key_callback(glfw.KEY_V)   # video record toggles only if offscreen
    rec = getattr(v, "record", False)  # GL exists; never crashes headless
    assert rec in (True, False)
    if rec:
        v._vid_frames.append(__import__("numpy").zeros((4, 4, 3), "uint8"))
        v.key_callback(glfw.KEY_V)   # stop + save
        assert not v.record
    v.key_callback(glfw.KEY_R)
    assert v.stop
    assert v.n_windows() == 4
