"""Mocap pipeline tests: BVH parsing, skeleton -> MJCF generation, frame
loading/resampling, end-to-end conversion to qpos trajectories."""
import os

import numpy as np
import pytest

from egopose_tpu.mocap import Bvh, Skeleton, load_bvh_file, interpolated_traj

BVH_TEXT = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation
  JOINT Spine
  {
    OFFSET 0.0 2.0 4.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    JOINT Head
    {
      OFFSET 0.0 1.0 6.0
      CHANNELS 3 Xrotation Yrotation Zrotation
      End Site
      {
        OFFSET 0.0 0.0 3.0
      }
    }
  }
  JOINT LeftLeg
  {
    OFFSET 1.0 0.0 -4.0
    CHANNELS 3 Xrotation Yrotation Zrotation
    End Site
    {
      OFFSET 0.0 0.0 -8.0
    }
  }
}
MOTION
Frames: 3
Frame Time: 0.008333
0 0 36 0 0 0  10 0 0  0 5 0  0 0 20
1 0 36 0 0 5  12 0 0  0 6 0  0 0 22
2 0 36 0 0 10 14 0 0  0 7 0  0 0 24
"""


@pytest.fixture(scope="module")
def bvh_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("mocap")
    p = d / "0000_take_01.bvh"
    p.write_text(BVH_TEXT)
    return str(p)


def test_bvh_parser(bvh_file):
    mocap = Bvh(open(bvh_file).read())
    assert mocap.get_joints_names() == ["Hips", "Spine", "Head", "LeftLeg"]
    assert mocap.nframes == 3
    assert mocap.joint_channels("Hips") == [
        "Xposition", "Yposition", "Zposition", "Xrotation", "Yrotation",
        "Zrotation"]
    assert np.allclose(mocap.joint_offset("Spine"), (0, 2, 4))
    vals = mocap.frame_joint_channels(1, "Spine",
                                      ["Xrotation", "Yrotation", "Zrotation"])
    assert vals == [12.0, 0.0, 0.0]
    assert mocap.joint_parent("Head").name == "Spine"


def test_skeleton_and_xml(bvh_file, tmp_path):
    skel = Skeleton()
    skel.load_from_bvh(bvh_file)
    assert [b.name for b in skel.bones] == ["Hips", "Spine", "Head", "LeftLeg"]
    # positions from offsets (scaled by 0.0254)
    np.testing.assert_allclose(skel.name2bone["Head"].pos,
                               np.array([0, 3, 10]) * 0.0254)
    out = str(tmp_path / "gen.xml")
    skel.write_xml(out)
    # the generated model must load in our engine and in MuJoCo 3
    from egopose_tpu.physics import parse_mjcf, export_mjcf, build_model
    spec = parse_mjcf(out)
    assert spec.nbody == 4
    assert spec.nq == 7 + 9  # free root + 3 bones x 3 hinges
    import mujoco
    mj = mujoco.MjModel.from_xml_string(open(out).read())
    assert mj.nq == spec.nq
    build_model(spec)


def test_frame_loading_and_interp(bvh_file):
    skel = Skeleton()
    skel.load_from_bvh(bvh_file)
    poses, bone_addr = load_bvh_file(bvh_file, skel)
    assert poses.shape == (3, 6 + 9)
    # root translation scaled to meters, rotations to radians
    np.testing.assert_allclose(poses[1, :3], [1 * 0.0254, 0, 36 * 0.0254])
    np.testing.assert_allclose(poses[1, 5], np.deg2rad(5))
    assert bone_addr["Spine"] == (6, 9)
    traj = interpolated_traj(poses, sample_t=1 / 240.0, mocap_fr=120)
    assert traj.shape[0] == 5  # 2 frames of span -> 1/60s *... upsampled 2x+1
    np.testing.assert_allclose(traj[1, 5], np.deg2rad(2.5))


def test_convert_clip_end_to_end(bvh_file, tmp_path, monkeypatch):
    """BVH -> qpos trajectories through the generated humanoid."""
    from egopose_tpu.cli import convert_clip, create_humanoid
    workdir = tmp_path
    (workdir / "datasets/traj").mkdir(parents=True)
    (workdir / "assets/mujoco_models").mkdir(parents=True)
    import shutil
    shutil.copy(bvh_file, workdir / "datasets/traj/0000_take_01.bvh")
    monkeypatch.chdir(workdir)
    create_humanoid.main(["--mocap-id", "0000", "--skt-id", "take_01",
                          "--out-id", "humanoid_0000_orig"])
    convert_clip.main(["--model-id", "humanoid_0000_orig",
                       "--mocap-id", "0000", "--mocap-fr", "120"])
    import pickle
    traj = pickle.load(open(workdir / "datasets/traj/0000_take_01_traj.p",
                            "rb"))
    # nq of the generated model: free root (7) + Spine/Head 3 hinges each +
    # LeftLeg restricted to Xrotation by SPEC_CHANNELS = 14
    assert traj.shape[1] == 14
    assert np.isfinite(traj).all()
    # root quaternion is unit
    np.testing.assert_allclose(np.linalg.norm(traj[:, 3:7], axis=1), 1.0,
                               atol=1e-9)


AMC_TEXT = """#!OML:ASF
:FULLY-SPECIFIED
:DEGREES
1
root 1.0 2.0 3.0 10.0 20.0 30.0
lowerback 5.0 -4.0 3.0
lfoot 15.0 25.0
2
root 2.0 3.0 4.0 11.0 21.0 31.0
lowerback 6.0 -5.0 4.0
lfoot 16.0 26.0
"""


def test_amc_loading(tmp_path):
    """AMC loader: root translation scaled, angles to radians, per-bone
    value order reversed (reference mocap/pose.py:7-42 conventions)."""
    import numpy as np
    from egopose_tpu.mocap.pose import load_amc_file
    p = tmp_path / "clip.amc"
    p.write_text(AMC_TEXT)
    poses, addr = load_amc_file(str(p), scale=0.5)
    assert poses.shape == (2, 11)
    assert addr == {"root": (0, 6), "lowerback": (6, 9), "lfoot": (9, 11)}
    np.testing.assert_allclose(poses[0, :3], [0.5, 1.0, 1.5])
    np.testing.assert_allclose(poses[0, 3:6],
                               np.radians([10.0, 20.0, 30.0]))
    # non-root bones: file order reversed
    np.testing.assert_allclose(poses[0, 6:9], np.radians([3.0, -4.0, 5.0]))
    np.testing.assert_allclose(poses[1, 9:11], np.radians([26.0, 16.0]))


ASF_TEXT = """# test skeleton
:version 1.10
:name VICON
:units
  mass 1.0
  length 0.45
  angle deg
:documentation
  example
:root
  order TX TY TZ RX RY RZ
  axis XYZ
  position 0 0 0
  orientation 0 0 0
:bonedata
  begin
     id 1
     name lowerback
     direction 0.0 1.0 0.0
     length 2.0
     axis 0 0 30  XYZ
    dof rx ry rz
    limits (-20.0 45.0)
           (-30.0 30.0)
           (-30.0 30.0)
  end
  begin
     id 2
     name upperback
     direction 0.0 0.9 0.1
     length 2.1
     axis 0 0 0  XYZ
    dof rx rz
    limits (-20.0 45.0)
           (-30.0 30.0)
  end
:hierarchy
  begin
    root lowerback
    lowerback upperback
  end
"""


def test_asf_loading(tmp_path):
    """ASF parser: units, bone fields, reversed dof order, limits,
    hierarchy, forward kinematics (reference skeleton.py:44-119 behavior)."""
    import numpy as np
    from egopose_tpu.mocap import Skeleton
    p = tmp_path / "skel.asf"
    p.write_text(ASF_TEXT)
    sk = Skeleton()
    sk.load_from_asf(str(p))
    assert [b.name for b in sk.bones] == ["root", "lowerback", "upperback"]
    lb = sk.name2bone["lowerback"]
    scale = 1 / 0.45 * 0.0254
    assert abs(lb.len - 2.0 * scale) < 1e-12
    assert lb.dof_index == [2, 1, 0]       # file rx ry rz -> reversed
    assert lb.lb == [-20.0, -30.0, -30.0]
    assert lb.ub == [45.0, 30.0, 30.0]
    ub = sk.name2bone["upperback"]
    assert ub.dof_index == [2, 0]
    assert ub.parent is lb and lb.parent is sk.root
    # axis 0 0 30 -> z-rotation of the orientation frame
    np.testing.assert_allclose(
        lb.orient[:, 0], [np.cos(np.radians(30)), np.sin(np.radians(30)), 0],
        atol=1e-12)
    # FK: lowerback ends 2*scale along +y; upperback starts there
    np.testing.assert_allclose(lb.end, [0, 2.0 * scale, 0], atol=1e-12)
    np.testing.assert_allclose(ub.pos, lb.end, atol=1e-12)
