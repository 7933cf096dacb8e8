"""Locate packaged MJCF model assets.

The reference scripts resolve humanoid XMLs relative to the repo checkout
(e.g. ego_mimic.py builds "assets/mujoco_models/%s.xml" from cfg.mujoco_model).
This framework ships its own regenerated assets under assets/mujoco_models/;
resolution must work both from the repo root and from arbitrary working
directories (installed package), and must never reach outside the repo.
"""
import os

# repo root = parent of the egopose_tpu package directory
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def find_model_xml(name_or_path):
    """Resolve a humanoid model to an XML path inside this repo's assets.

    Accepts either an explicit path (returned as-is when it exists) or a
    model id like "humanoid_1205_v1" / "humanoid_1205_vis_single_v1".
    Searches the working directory first (the reference's convention), then
    the packaged assets next to the egopose_tpu package.
    """
    if name_or_path.endswith(".xml"):
        candidates = [name_or_path,
                      os.path.join(_REPO_ROOT, name_or_path)]
    else:
        rel = os.path.join("assets", "mujoco_models", name_or_path + ".xml")
        candidates = [rel, os.path.join(_REPO_ROOT, rel)]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        "model XML %r not found (searched %s) -- regenerate it with "
        "cli/create_humanoid.py or add it under assets/mujoco_models/"
        % (name_or_path, ", ".join(candidates)))
