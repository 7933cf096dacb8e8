"""egopose_tpu — a TPU-native framework for egocentric pose estimation & forecasting.

A ground-up JAX/XLA re-design of the capabilities of EgoPose (ICCV'19,
"Ego-Pose Estimation and Forecasting as Real-Time PD Control"):

- ``physics``  : batched rigid-body dynamics engine (FK/CRBA/RNEA/contacts),
                 the TPU-native replacement for the MuJoCo C engine used by the
                 reference (see /root/reference/envs/common/mujoco_env.py).
- ``envs``     : functional humanoid imitation environments (pure step/reset).
- ``models``   : flax CNN/LSTM/TCN model zoo with torch-checkpoint import.
- ``rl``       : PPO/TRPO, GAE, distributions, vmapped scan rollout engine.
- ``parallel`` : device-mesh runtime (pjit sharding of rollout lanes/updates).
- ``data``     : dataset + offline feature pipelines (expert, CNN features).
- ``mocap``    : BVH/AMC parsing, skeleton -> model spec generation.
"""

__version__ = "0.1.0"
