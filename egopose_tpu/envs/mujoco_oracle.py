"""MuJoCo C oracle physics for the cross-engine parity harness.

The reference runs its env on MuJoCo via mujoco_py
(/root/reference/envs/common/mujoco_env.py:22-34) with a stable-PD torque
computed per substep (/root/reference/ego_pose/envs/humanoid_v1.py:130-174).
This module reproduces exactly that control loop on the installed MuJoCo 3 C
library, so a policy trained in the JAX engine can be rolled out CLOSED-LOOP
under the reference's physics (``ego_mimic_eval --engine mujoco``) and its
eval metrics compared 1:1 against the JAX-engine rollout (SURVEY 7.4.1:
sim-to-sim fidelity is the top-ranked hard part).

Host-side by design: this is the golden oracle, not a production path.  The
batch dimension is a python loop over takes; the oracle's own arithmetic is
float64 as in the reference.  NOTE: in the closed loop (ego_mimic_eval
--engine mujoco) the (qpos, qvel) handed back between control steps pass
through the eval EnvState in the eval dtype -- f32 by default -- so the
oracle trajectory is f32-quantized at control-step boundaries; pass --f64
for full-f64 oracle parity.
"""
from __future__ import annotations

import numpy as np


class MuJoCoOracle:
    """Batched stable-PD control stepping on MuJoCo C.

    One persistent MjData per lane (take) keeps MuJoCo's internal warmstart
    state exactly as the reference's per-env simulation does.
    """

    def __init__(self, spec, n_lanes: int, jkp, jkd, torque_lim,
                 frame_skip: int = 15):
        import mujoco
        from ..physics import export_mjcf
        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(export_mjcf(spec))
        self.data = [mujoco.MjData(self.model) for _ in range(n_lanes)]
        self.frame_skip = frame_skip
        nv = self.model.nv
        self.kp = np.zeros(nv)
        self.kd = np.zeros(nv)
        self.kp[6:] = np.asarray(jkp, np.float64)
        self.kd[6:] = np.asarray(jkd, np.float64)
        self.jkp = np.asarray(jkp, np.float64)
        self.jkd = np.asarray(jkd, np.float64)
        self.tl = np.asarray(torque_lim, np.float64)
        self._mfull = np.zeros((nv, nv))

    def _stable_pd_torque(self, d, ctrl):
        """compute_desired_accel + stable-PD torque (humanoid_v1.py:130-157):
        tau = -kp*e - kd*(edot + qacc*dt) with qacc from
        (M + dt*diag(kd)) qacc = -C - kp*e - kd*edot."""
        from scipy.linalg import cho_factor, cho_solve
        mj, m = self._mujoco, self.model
        mj.mj_forward(m, d)
        mj.mj_fullM(m, d, self._mfull)
        e = np.concatenate([np.zeros(6), d.qpos[7:] - ctrl])
        ed = d.qvel.copy()
        qacc = cho_solve(
            cho_factor(self._mfull + np.diag(self.kd) * m.opt.timestep),
            -d.qfrc_bias - self.kp * e - self.kd * ed)
        tq = -self.jkp * e[6:] - self.jkd * (ed + qacc * m.opt.timestep)[6:]
        return np.clip(tq, -self.tl, self.tl)

    def control_step(self, qpos, qvel, ctrl):
        """One 30 Hz control step for every lane: frame_skip substeps of
        stable-PD torque + mj_step (do_simulation, humanoid_v1.py:159-174).
        Arrays are (B, nq)/(B, ndof)/(B, nu) host or device; returns numpy
        (B, nq), (B, ndof)."""
        qpos = np.asarray(qpos, np.float64)
        qvel = np.asarray(qvel, np.float64)
        ctrl = np.asarray(ctrl, np.float64)
        mj = self._mujoco
        out_q = np.empty_like(qpos)
        out_v = np.empty_like(qvel)
        for i, d in enumerate(self.data):
            d.qpos[:] = qpos[i]
            d.qvel[:] = qvel[i]
            for _ in range(self.frame_skip):
                d.ctrl[:] = self._stable_pd_torque(d, ctrl[i])
                mj.mj_step(self.model, d)
            out_q[i] = d.qpos
            out_v[i] = d.qvel
        return out_q, out_v
