"""Learning-curve receipts for the full reference training protocol
(VERDICT r4 item 1): run the product eval chain (ego_mimic_eval +
eval_pose-style stats) at each requested checkpoint of a trained
subject_03 run and print one JSON row per iter — reward is read from the
training log, pose_dist/vel_dist/accel + num_reset from the eval chain.

Matches the reference protocol docs (/root/reference/docs/train_and_test.md
+ ego_pose/ego_mimic_eval.py -> eval_pose.py --mode stats).

Usage (TPU, one process at a time; run AFTER training completes):
  python tools/learning_curve.py                # iters 0 100 500 1000 2000 3000
  CURVE_ITERS="0 100 3000" python tools/learning_curve.py
"""
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

ITERS = [int(x) for x in os.environ.get(
    "CURVE_ITERS", "0 100 500 1000 2000 3000").split()]
TRAIN_LOG = os.environ.get("CURVE_LOG",
                           "results/egomimic/subject_03/log/log.txt")


def train_log_rewards(path):
    """iter -> (R_avg, eps_len) from the training log's iteration lines."""
    out = {}
    if not os.path.exists(path):
        return out
    pat = re.compile(r"\s(\d+)\tT_sample.*?R_avg ([0-9.]+).*?"
                     r"eps_len_avg ([0-9.]+)")
    for line in open(path):
        m = pat.search(line)
        if m:
            out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def main():
    from egopose_tpu.cli import ego_mimic_eval
    from egopose_tpu.cli.eval_pose import compute_stats

    rewards = train_log_rewards(TRAIN_LOG)
    for it in ITERS:
        if it > 0 and not os.path.exists(
                f"results/egomimic/subject_03/models/iter_{it:04d}.p"):
            print(json.dumps({"iter": it, "skipped": "no checkpoint"}))
            continue
        res, meta = ego_mimic_eval.main(
            ["--cfg", "subject_03", "--synthetic", "--iter", str(it)])
        stats = compute_stats(res)
        row = {"iter": it,
               "pose_dist": round(float(stats["pose_dist"]), 4),
               "vel_dist": round(float(stats["vel_dist"]), 4),
               "accel": round(float(stats["accel"]), 4),
               "num_reset": int(meta["num_reset"])}
        r = rewards.get(it) or rewards.get(it - 1)
        if r:
            row["train_reward"], row["train_eps_len"] = r
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
