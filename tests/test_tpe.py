"""TPE hyper-parameter search (manipose_tpu/utils/tpe.py): sampler
correctness, persistence/resume, and convergence advantage over random
search (VERDICT r1 item #8; reference wires hydra-optuna-sweeper,
``main_h36m_lifting.py:1264-1266``)."""

import json

import numpy as np
import pytest

from manipose_tpu.utils.tpe import (
    Param,
    RandomSampler,
    TPESampler,
    parse_space,
    run_sweep,
)


class TestSpace:
    def test_parse_space(self):
        space = parse_space([
            "lr=loguniform:1e-4,1e-2", "h=choice:16,32,64", "d=int:1,4",
            "w=uniform:0,1",
        ])
        kinds = {p.name: p.kind for p in space}
        assert kinds == {"lr": "loguniform", "h": "choice", "d": "int",
                         "w": "uniform"}

    def test_roundtrip_and_bounds(self):
        p = Param.parse("lr", "loguniform:1e-4,1e-2")
        assert abs(p.from_internal(p.to_internal(3e-3)) - 3e-3) < 1e-12
        assert p.from_internal(100.0) == pytest.approx(1e-2)  # clamped
        c = Param.parse("h", "choice:16,32,64")
        assert c.from_internal(c.to_internal("32")) == "32"
        i = Param.parse("d", "int:1,4")
        assert i.from_internal(2.6) == 3

    def test_uniform_samples_in_bounds(self):
        rng = np.random.default_rng(0)
        p = Param.parse("lr", "loguniform:1e-4,1e-2")
        xs = [p.sample_uniform(rng) for _ in range(200)]
        assert all(1e-4 <= x <= 1e-2 for x in xs)
        # log-uniform: median near geometric mean, not arithmetic
        assert 5e-4 < np.median(xs) < 2e-3


class TestSweep:
    def _quadratic(self, params, trial):
        return (params["x"] - 0.3) ** 2 + (params["y"] - 0.7) ** 2

    def test_run_sweep_minimizes(self):
        space = parse_space(["x=uniform:0,1", "y=uniform:0,1"])
        best, val, hist = run_sweep(
            self._quadratic, space, 40, sampler=TPESampler(space, seed=0),
            verbose=False,
        )
        assert val < 0.02
        assert len(hist) == 40

    def test_journal_persistence_and_resume(self, tmp_path):
        space = parse_space(["x=uniform:0,1", "y=uniform:0,1"])
        journal = tmp_path / "sweep.jsonl"
        run_sweep(self._quadratic, space, 10,
                  sampler=TPESampler(space, seed=0), journal=journal,
                  verbose=False)
        assert len(journal.read_text().splitlines()) == 10

        calls = []

        def counting(params, trial):
            calls.append(trial)
            return self._quadratic(params, trial)

        best, val, hist = run_sweep(
            counting, space, 15, sampler=TPESampler(space, seed=1),
            journal=journal, verbose=False,
        )
        assert len(hist) == 15 and len(calls) == 5  # only 5 new trials
        assert len(journal.read_text().splitlines()) == 15

    def test_failed_trials_are_tolerated(self):
        space = parse_space(["x=uniform:0,1"])

        def flaky(params, trial):
            return None if trial % 3 == 0 else (params["x"] - 0.5) ** 2

        best, val, hist = run_sweep(
            flaky, space, 20, sampler=TPESampler(space, seed=0),
            verbose=False,
        )
        assert best is not None and val < 0.05

    def test_choice_dimension_concentrates(self):
        space = parse_space(["h=choice:bad1,good,bad2", "x=uniform:0,1"])

        def objective(params, trial):
            base = 0.0 if params["h"] == "good" else 1.0
            return base + 0.1 * (params["x"] - 0.5) ** 2

        sampler = TPESampler(space, seed=0, n_startup=6)
        best, val, hist = run_sweep(objective, space, 30, sampler=sampler,
                                    verbose=False)
        assert best["h"] == "good"
        # after startup, TPE should pick "good" most of the time
        post = [p["h"] for p, _ in hist[6:]]
        assert post.count("good") / len(post) > 0.6

    def test_tpe_beats_random_on_average(self):
        """The VERDICT done-criterion: TPE converges faster than random.
        Averaged over 12 paired repetitions of a 25-trial budget on a
        2D multi-basin objective (deterministic seeds)."""

        def objective(params, trial):
            x, y = params["x"], params["y"]
            return (
                (x - 0.22) ** 2 + (y - 0.81) ** 2
                + 0.15 * np.sin(9 * x) ** 2 + 0.15 * np.sin(9 * y) ** 2
            )

        space = parse_space(["x=uniform:0,1", "y=uniform:0,1"])
        tpe_scores, rnd_scores = [], []
        for seed in range(12):
            _, v_tpe, _ = run_sweep(objective, space, 25,
                                    sampler=TPESampler(space, seed=seed),
                                    verbose=False)
            _, v_rnd, _ = run_sweep(objective, space, 25,
                                    sampler=RandomSampler(space, seed=seed),
                                    verbose=False)
            tpe_scores.append(v_tpe)
            rnd_scores.append(v_rnd)
        assert np.mean(tpe_scores) < np.mean(rnd_scores), (
            np.mean(tpe_scores), np.mean(rnd_scores)
        )
