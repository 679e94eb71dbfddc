"""TPE sampler (utils/tpe.py): the dependency-free replacement for the
reference's Ray/HyperOpt tolerance search (tune_tolerance.py:161-184)."""

import numpy as np

from dusty_gan_tpu.utils.tpe import tpe_minimize


def _objective(opt=0.008, noise=0.0, seed=0):
    """Smooth log-quadratic bowl with optimum at the paper's tol=0.008."""
    rng = np.random.RandomState(seed)

    def f(x):
        return (np.log(x) - np.log(opt)) ** 2 + noise * rng.randn()

    return f


class TestTPE:
    def test_converges_to_known_optimum(self):
        best_x, best_y, trials = tpe_minimize(
            _objective(), 1e-3, 1e-1, num_samples=60, seed=0, n_startup=15
        )
        assert len(trials) == 60
        # within 10% of the optimum in log space
        assert abs(np.log(best_x) - np.log(0.008)) < np.log(1.10)
        assert best_y < 0.01

    def test_exploits_after_startup(self):
        """post-startup proposals concentrate near the optimum: the mean
        log-distance of late trials must beat the startup (random) ones."""
        _, _, trials = tpe_minimize(
            _objective(), 1e-3, 1e-1, num_samples=60, seed=1, n_startup=15
        )
        d = [abs(np.log(t["x"]) - np.log(0.008)) for t in trials]
        assert np.mean(d[30:]) < 0.5 * np.mean(d[:15])

    def test_beats_random_search_on_average(self):
        wins = 0
        for seed in range(5):
            f = _objective(noise=0.05, seed=seed)
            bx_tpe, by_tpe, _ = tpe_minimize(
                f, 1e-3, 1e-1, num_samples=40, seed=seed, n_startup=10
            )
            rng = np.random.RandomState(1000 + seed)
            xs = np.exp(rng.uniform(np.log(1e-3), np.log(1e-1), 40))
            by_rand = min(f(float(x)) for x in xs)
            wins += by_tpe <= by_rand
        assert wins >= 3

    def test_respects_bounds_and_determinism(self):
        f = _objective()
        bx1, _, tr1 = tpe_minimize(f, 1e-3, 1e-1, num_samples=30, seed=7)
        bx2, _, tr2 = tpe_minimize(f, 1e-3, 1e-1, num_samples=30, seed=7)
        assert bx1 == bx2
        assert [t["x"] for t in tr1] == [t["x"] for t in tr2]
        assert all(1e-3 <= t["x"] <= 1e-1 for t in tr1)

    def test_linear_space(self):
        best_x, _, _ = tpe_minimize(
            lambda x: (x - 0.3) ** 2, 0.0, 1.0, num_samples=50, seed=0,
            n_startup=12, log_space=False,
        )
        assert abs(best_x - 0.3) < 0.05


class TestBatchedTPE:
    def test_budget_and_convergence(self):
        import math

        from dusty_gan_tpu.utils.tpe import tpe_minimize_batched

        calls = []

        def f(xs):
            calls.append(len(xs))
            return [(math.log(x) - math.log(0.01)) ** 2 for x in xs]

        best_x, best_y, trials = tpe_minimize_batched(
            f, 1e-3, 1e-1, num_samples=40, seed=0, n_startup=10, batch=8
        )
        assert len(trials) == 40
        assert all(n <= 8 for n in calls) and sum(calls) == 40
        assert len(calls) == 5  # 40 trials in 8-wide rounds
        assert abs(math.log(best_x) - math.log(0.01)) < 0.5

    def test_batch_one_matches_sequential_budget(self):
        from dusty_gan_tpu.utils.tpe import tpe_minimize_batched

        best_x, best_y, trials = tpe_minimize_batched(
            lambda xs: [(x - 0.05) ** 2 for x in xs],
            1e-3, 1e-1, num_samples=15, seed=1, n_startup=5, batch=1,
        )
        assert len(trials) == 15
        assert 1e-3 <= best_x <= 1e-1
