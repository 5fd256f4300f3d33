"""Wall-clock phase timers + episode stats printing.

Port of PPOTimer (scripts/ppo_stats.py:53-150) with the same phase taxonomy
(iter / rollout / sim / inference / update) and FPS getters.  The on-device
trainers compile rollout+GAE+update into ONE program, so only `iter` is
observable from the host there (print() says so); the sub-phases exist for
host-loop drivers (e.g. stepping BasketballEnv per tick) that can fence and
time them like the reference does.
"""

from __future__ import annotations

from time import perf_counter


class PPOTimer:
    PHASES = ("iter", "rollout", "sim", "inference", "update")

    def __init__(self):
        self.global_step = 0
        self.reset()
        self._starts = {}

    def reset(self):
        self.t = {p: 0.0 for p in self.PHASES}
        self.iter_step = 0

    def start(self, phase: str):
        self._starts[phase] = perf_counter()

    def end(self, phase: str):
        start = self._starts.pop(phase, None)
        assert start is not None, f"{phase} start not set"
        self.t[phase] += perf_counter() - start

    def add_steps(self, steps: int):
        self.iter_step += steps
        self.global_step += steps

    def fps(self, phase: str) -> int:
        el = self.t[phase]
        return int(self.iter_step / el) if el > 0 else 0

    def print(self):
        print(f"Took {self.t['iter']:.2f} seconds. "
              f"FPS: {self.fps('iter')}. Global {self.global_step:_}")
        if self.t["rollout"] or self.t["update"]:
            # scripts/ppo_stats.py:144-150 second line, plus the per-
            # phase FPS the getters expose (scripts/ppo_stats.py:124-139)
            print(f"Sim only: {self.t['sim']:.2f}s, "
                  f"Inference: {self.t['inference']:.2f}s, "
                  f"Update: {self.t['update']:.2f}s")
            print(f"Phase FPS: rollout {self.fps('rollout')}, "
                  f"sim {self.fps('sim')}, "
                  f"inference {self.fps('inference')}, "
                  f"update {self.fps('update')}")
        else:
            # Fused path: rollout+GAE+update compile into ONE device
            # program, so there are no host-visible sub-phase boundaries
            # to time (the reference's sim/inference/update split exists
            # because it crosses the host every step).
            print("(rollout+update fused into one device program)")
