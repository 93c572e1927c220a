"""Experiment-directory and run-control utilities.

Mirrors the reference's runner-layer helpers (/root/reference/utils.py:11-107):
run-dir layout ``{log,data,model}`` / ``{eva_data,eva_log}``, timestamped
file+stream logging, the test-mode flag decoder, and the global step Counter.
"""

from __future__ import annotations

import logging
import os
import shutil
import time


def check_dir(cur_dir: str) -> bool:
    return os.path.exists(cur_dir)


def copy_file(src: str, dst_dir: str) -> None:
    shutil.copy(src, dst_dir)


def find_file(cur_dir: str, suffix: str = ".ini"):
    for fname in sorted(os.listdir(cur_dir)):
        if fname.endswith(suffix):
            return os.path.join(cur_dir, fname)
    logging.error("Cannot find %s file in %s", suffix, cur_dir)
    return None


def init_dir(base_dir: str, pathes=("log", "data", "model")) -> dict:
    os.makedirs(base_dir, exist_ok=True)
    dirs = {}
    for path in pathes:
        cur_dir = os.path.join(base_dir, path)
        os.makedirs(cur_dir, exist_ok=True)
        dirs[path] = cur_dir + os.sep
    return dirs


def init_log(log_dir: str, file_output: bool = True) -> None:
    """``file_output=False`` on non-zero hosts of a multi-host run keeps
    every process's stream logging without racing on shared log files."""
    handlers = [logging.StreamHandler()]
    if file_output:
        handlers.insert(
            0, logging.FileHandler(os.path.join(log_dir, "%d.log" % time.time()))
        )
    logging.basicConfig(
        format="%(asctime)s [%(levelname)s] %(message)s",
        level=logging.INFO,
        force=True,
        handlers=handlers,
    )


def init_test_flag(test_mode: str):
    """-> (in_train_test, after_train_test) per /root/reference/utils.py:51-60."""
    return {
        "no_test": (False, False),
        "in_train_test": (True, False),
        "after_train_test": (False, True),
        "all_test": (True, True),
    }.get(test_mode, (False, False))


class Counter:
    """Global env-step counter with test/log cadence (ref utils.py:70-107).

    Unlike the reference, steps can advance by more than one at a time
    (batched envs advance ``num_envs`` env-steps per control step) and the
    state is (de)serializable so training can actually resume.
    """

    def __init__(self, total_step: int, test_step: int, log_step: int):
        self.cur_step = 0
        self.cur_test_step = 0
        self.total_step = total_step
        self.test_step = test_step
        self.log_step = log_step
        self._last_log_bucket = 0
        self.stop = False

    def next(self, n: int = 1) -> int:
        self.cur_step += n
        return self.cur_step

    def should_test(self) -> bool:
        if (self.cur_step - self.cur_test_step) >= self.test_step:
            self.cur_test_step = self.cur_step
            return True
        return False

    def should_log(self) -> bool:
        bucket = self.cur_step // self.log_step
        if bucket != self._last_log_bucket:
            self._last_log_bucket = bucket
            return True
        return False

    def should_stop(self) -> bool:
        return self.stop or (self.cur_step >= self.total_step)

    def state_dict(self) -> dict:
        return {
            "cur_step": self.cur_step,
            "cur_test_step": self.cur_test_step,
            "last_log_bucket": self._last_log_bucket,
        }

    def load_state_dict(self, state: dict) -> None:
        self.cur_step = int(state["cur_step"])
        self.cur_test_step = int(state["cur_test_step"])
        self._last_log_bucket = int(state["last_log_bucket"])
