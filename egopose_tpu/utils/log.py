"""Text + scalar logging (mirrors /root/reference/utils/logger.py and the
TF1 summary writer in utils/tb_logger.py, without the TF dependency).

Scalars are written as TensorBoard-compatible event files when
tensorboard's pure-python writer is importable, with a JSONL fallback.
"""
from __future__ import annotations

import json
import logging
import os
import time


def create_logger(filename=None, file_handle=True):
    logger = logging.getLogger("egopose_tpu")
    logger.handlers.clear()
    logger.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s %(message)s", "%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename and file_handle:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """Scalar summaries: tensorboard event file if available, else JSONL."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from tensorboard.summary.writer.event_file_writer import EventFileWriter
            from tensorboard.compat.proto.summary_pb2 import Summary
            from tensorboard.compat.proto.event_pb2 import Event
            self._tb = EventFileWriter(logdir)
            self._Summary, self._Event = Summary, Event
        except Exception:
            self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def scalar(self, tag, value, step):
        if self._tb is not None:
            s = self._Summary(value=[self._Summary.Value(tag=tag,
                                                         simple_value=float(value))])
            self._tb.add_event(self._Event(summary=s, step=step,
                                           wall_time=time.time()))
        else:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                          "step": step, "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
