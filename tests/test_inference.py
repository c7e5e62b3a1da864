"""Statistical end-to-end inference suite against analytic ground truths —
the reference's dominant test pattern (reference: tests/test_inference.py):
GUM, GUM-Marsaglia, HMM vs forward-backward marginals, Branching vs the
enumerated posterior, MiniCaptcha MAP accuracy with a CNN observe
embedding.  Engines are exercised per model; a scoreboard prints at the
end of the module (reference: tests/test_inference.py:872-883)."""

import math
import os
import time

import numpy as np
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu import util
from pyprob_tpu.distributions import (
    Categorical,
    Distribution,
    Empirical,
    Normal,
    Poisson,
    Uniform,
)

IS_SAMPLES = 4000
IC_SAMPLES = 4000
# Reference trains 50,000 traces before asserting the 15% IC ESS floor
# (reference: tests/test_inference.py:149,178); 51,200 = nearest multiple
# of the 256 batch size, matching the Marsaglia combos below.
IC_TRAIN = 51200
MCMC_SAMPLES = 7000

_scoreboard = []


def _record(engine, model, duration, metric):
    _scoreboard.append((engine, model, duration, metric))


@pytest.fixture(scope="module", autouse=True)
def _print_scoreboard():
    yield
    print("\nEngine scoreboard (engine | model | seconds | metric):")
    for engine, model, duration, metric in _scoreboard:
        print(f"  {engine:10s} | {model:12s} | {duration:7.2f}s | {metric}")


# ---------------------------------------------------------------------------
# GUM
# ---------------------------------------------------------------------------


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


GUM_OBS = {"obs0": 8, "obs1": 9}
GUM_TRUE = Normal(7.25, math.sqrt(1 / 1.2))


def _check_gum(post, engine, n, ess_floor=None, burn_in=0):
    if burn_in:
        post = post[burn_in:]
    mean = float(post.mean)
    stddev = float(post.stddev)
    kl = float(
        Distribution.kl_divergence(Normal(mean, max(stddev, 1e-3)), GUM_TRUE)
    )
    assert abs(mean - 7.25) < 0.75
    assert abs(stddev - math.sqrt(1 / 1.2)) < 0.75
    assert kl < 0.25
    if ess_floor is not None:
        assert post.effective_sample_size > ess_floor * n
    return kl


def test_gum_importance_sampling():
    m = GUM()
    t0 = time.time()
    post = m.posterior_results(IS_SAMPLES, observe=GUM_OBS)
    # ESS floor 0.5% (reference: tests/test_inference.py:121)
    kl = _check_gum(post, "IS", IS_SAMPLES, ess_floor=0.005)
    _record("IS", "GUM", time.time() - t0, f"KL {kl:.4f}")


def test_gum_ic_lstm():
    m = GUM()
    m.learn_inference_network(
        num_traces=IC_TRAIN,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.01,
        lstm_dim=128,
    )
    t0 = time.time()
    post = m.posterior_results(
        IC_SAMPLES,
        observe=GUM_OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    # IC ESS floor 15% (reference: tests/test_inference.py:149)
    kl = _check_gum(post, "IC-LSTM", IC_SAMPLES, ess_floor=0.15)
    _record("IC-LSTM", "GUM", time.time() - t0, f"KL {kl:.4f}")


def test_gum_ic_ff():
    m = GUM()
    m.learn_inference_network(
        num_traces=IC_TRAIN,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=256,
        learning_rate_init=0.01,
    )
    t0 = time.time()
    post = m.posterior_results(
        IC_SAMPLES,
        observe=GUM_OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    kl = _check_gum(post, "IC-FF", IC_SAMPLES, ess_floor=0.15)
    _record("IC-FF", "GUM", time.time() - t0, f"KL {kl:.4f}")


def test_gum_lmh():
    m = GUM()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        observe=GUM_OBS,
    )
    kl = _check_gum(post, "LMH", MCMC_SAMPLES, burn_in=1500)
    _record("LMH", "GUM", time.time() - t0, f"KL {kl:.4f}")


def test_gum_rmh():
    m = GUM()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe=GUM_OBS,
    )
    kl = _check_gum(post, "RMH", MCMC_SAMPLES, burn_in=1000)
    _record("RMH", "GUM", time.time() - t0, f"KL {kl:.4f}")


# ---------------------------------------------------------------------------
# GUM-Marsaglia: rejection-sampling control flow, variable-length traces
# ---------------------------------------------------------------------------


class GUMMarsaglia(pp.Model):
    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)
        while True:
            x = pp.sample(uniform)
            y = pp.sample(uniform)
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                return mean + stddev * (float(x) * math.sqrt(-2 * math.log(s) / s))

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def test_marsaglia_importance_sampling():
    m = GUMMarsaglia()
    t0 = time.time()
    post = m.posterior_results(IS_SAMPLES, observe=GUM_OBS)
    # ESS floor 0.2% (reference: tests/test_inference.py:287)
    kl = _check_gum(post, "IS", IS_SAMPLES, ess_floor=0.002)
    _record("IS", "Marsaglia", time.time() - t0, f"KL {kl:.4f}")


def test_marsaglia_ic_ff():
    """Interpreter-tier Marsaglia IC-FF: the canonical universal-PPL IC
    benchmark — ESS floor 0.8% at the reference's training budget and
    embedding size (reference: tests/test_inference.py:17-37,310-338)."""
    m = GUMMarsaglia()
    m.learn_inference_network(
        num_traces=51200,  # reference: 50,000
        observe_embeddings={"obs0": {"dim": 128, "depth": 6},
                            "obs1": {"dim": 128, "depth": 6}},
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        prior_inflation=pp.PriorInflation.ENABLED,
        batch_size=256,
        learning_rate_init=0.002,
    )
    t0 = time.time()
    post = m.posterior_results(
        IC_SAMPLES,
        observe=GUM_OBS,
        vectorized=False,  # interpreter tier on purpose
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    kl = _check_gum(post, "IC-FF", IC_SAMPLES, ess_floor=0.008)
    _record("IC-FF", "Marsaglia", time.time() - t0, f"KL {kl:.4f}")


def test_marsaglia_ic_lstm():
    """Interpreter-tier Marsaglia IC-LSTM — ESS floor 1.6% at the
    reference's training budget and embedding size
    (reference: tests/test_inference.py:27-31,340-365)."""
    m = GUMMarsaglia()
    m.learn_inference_network(
        num_traces=51200,  # reference: 50,000
        observe_embeddings={"obs0": {"dim": 128, "depth": 6},
                            "obs1": {"dim": 128, "depth": 6}},
        inference_network=pp.InferenceNetwork.LSTM,
        prior_inflation=pp.PriorInflation.ENABLED,
        batch_size=256,
        learning_rate_init=0.002,
        lstm_dim=256,
    )
    t0 = time.time()
    post = m.posterior_results(
        IC_SAMPLES,
        observe=GUM_OBS,
        vectorized=False,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    kl = _check_gum(post, "IC-LSTM", IC_SAMPLES, ess_floor=0.016)
    _record("IC-LSTM", "Marsaglia", time.time() - t0, f"KL {kl:.4f}")


def test_marsaglia_lmh():
    m = GUMMarsaglia()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        observe=GUM_OBS,
    )
    kl = _check_gum(post, "LMH", MCMC_SAMPLES, burn_in=1000)
    _record("LMH", "Marsaglia", time.time() - t0, f"KL {kl:.4f}")


def test_marsaglia_rmh():
    m = GUMMarsaglia()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe=GUM_OBS,
    )
    kl = _check_gum(post, "RMH", MCMC_SAMPLES, burn_in=1000)
    _record("RMH", "Marsaglia", time.time() - t0, f"KL {kl:.4f}")


# ---------------------------------------------------------------------------
# HMM vs forward-backward posterior marginals
# (reference: tests/test_inference.py:413-574)
# ---------------------------------------------------------------------------

HMM_OBSERVATION = [0.9, 0.8, 0.7, 0.0, -0.025, -5.0, -2.0, -0.1, 0.0, 0.13,
                   0.45, 6, 0.2, 0.3, -1, -1]
HMM_POSTERIOR_CORRECT = np.array(
    [[0.3775, 0.3092, 0.3133],
     [0.0416, 0.4045, 0.5539],
     [0.0541, 0.2552, 0.6907],
     [0.0455, 0.2301, 0.7244],
     [0.1062, 0.1217, 0.7721],
     [0.0714, 0.1732, 0.7554],
     [0.9300, 0.0001, 0.0699],
     [0.4577, 0.0452, 0.4971],
     [0.0926, 0.2169, 0.6905],
     [0.1014, 0.1359, 0.7626],
     [0.0985, 0.1575, 0.7440],
     [0.1781, 0.2198, 0.6022],
     [0.0000, 0.9848, 0.0152],
     [0.1130, 0.1674, 0.7195],
     [0.0557, 0.1848, 0.7595],
     [0.2017, 0.0472, 0.7511],
     [0.2545, 0.0611, 0.6844]]
)


class HMM(pp.Model):
    """3-state HMM; jnp indexing keeps the program jax-traceable so the
    compiled tier can run it (identical semantics to the reference's
    int()-indexed version)."""

    def __init__(self):
        super().__init__(name="Hidden Markov model")
        self.T = jnp.asarray(
            [[0.1, 0.5, 0.4], [0.2, 0.2, 0.6], [0.15, 0.15, 0.7]]
        )
        self.means = jnp.asarray([-1.0, 1.0, 0.0])
        self.obs_length = len(HMM_OBSERVATION)

    def forward(self):
        state = pp.sample(Categorical(probs=jnp.asarray([1.0, 1.0, 1.0]) / 3.0))
        states = [state]
        for i in range(self.obs_length):
            state = pp.sample(Categorical(probs=self.T[state]))
            pp.observe(Normal(self.means[state], 1.0), name=f"obs{i}")
            states.append(state)
        import jax.nn

        return jax.nn.one_hot(jnp.stack(states), 3)


def _check_hmm(post):
    posterior_mean = np.asarray(post.mean)  # [17, 3]
    l2 = float(
        np.sum(
            np.sqrt(np.sum((posterior_mean - HMM_POSTERIOR_CORRECT) ** 2, axis=1))
        )
    )
    eps = 1e-6
    kl = 0.0
    for p, q in zip(posterior_mean, HMM_POSTERIOR_CORRECT):
        p = np.clip(p, eps, None)
        q = np.clip(q, eps, None)
        p, q = p / p.sum(), q / q.sum()
        kl += float(np.sum(p * np.log(p / q)))
    assert l2 < 3, l2
    assert kl < 1, kl
    return l2, kl


def test_hmm_importance_sampling_vectorized():
    m = HMM()
    obs = {f"obs{i}": HMM_OBSERVATION[i] for i in range(len(HMM_OBSERVATION))}
    t0 = time.time()
    post = m.posterior_results(20000, observe=obs, vectorized=True)
    assert post.effective_sample_size > 0.001 * 20000
    l2, kl = _check_hmm(post)
    _record("IS(vec)", "HMM", time.time() - t0, f"L2 {l2:.3f} KL {kl:.3f}")


def test_hmm_ic_lstm():
    m = HMM()
    obs = {f"obs{i}": HMM_OBSERVATION[i] for i in range(len(HMM_OBSERVATION))}
    m.learn_inference_network(
        num_traces=IC_TRAIN,
        observe_embeddings={
            f"obs{i}": {"depth": 2, "dim": 8} for i in range(len(HMM_OBSERVATION))
        },
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.005,
        lstm_dim=128,
    )
    t0 = time.time()
    post = m.posterior_results(
        10000,
        observe=obs,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert post.effective_sample_size > 0.001 * 10000
    l2, kl = _check_hmm(post)
    _record("IC-LSTM", "HMM", time.time() - t0, f"L2 {l2:.3f} KL {kl:.3f}")


def test_hmm_ic_ff():
    """HMM IC-FF — ESS floor 0.1% (reference: tests/test_inference.py:484)."""
    m = HMM()
    obs = {f"obs{i}": HMM_OBSERVATION[i] for i in range(len(HMM_OBSERVATION))}
    m.learn_inference_network(
        num_traces=IC_TRAIN,
        observe_embeddings={
            f"obs{i}": {"depth": 2, "dim": 8} for i in range(len(HMM_OBSERVATION))
        },
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=256,
        learning_rate_init=0.005,
    )
    t0 = time.time()
    post = m.posterior_results(
        10000,
        observe=obs,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert post.effective_sample_size > 0.001 * 10000
    l2, kl = _check_hmm(post)
    _record("IC-FF", "HMM", time.time() - t0, f"L2 {l2:.3f} KL {kl:.3f}")


def test_hmm_lmh():
    """HMM LMH — L2<3, KL<1 after burn-in
    (reference: tests/test_inference.py:536)."""
    m = HMM()
    obs = {f"obs{i}": HMM_OBSERVATION[i] for i in range(len(HMM_OBSERVATION))}
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        observe=obs,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )[700:]
    l2, kl = _check_hmm(post)
    _record("LMH", "HMM", time.time() - t0, f"L2 {l2:.3f} KL {kl:.3f}")


def test_hmm_rmh():
    """HMM RMH (reference: tests/test_inference.py:556)."""
    m = HMM()
    obs = {f"obs{i}": HMM_OBSERVATION[i] for i in range(len(HMM_OBSERVATION))}
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        observe=obs,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )[700:]
    l2, kl = _check_hmm(post)
    _record("RMH", "HMM", time.time() - t0, f"L2 {l2:.3f} KL {kl:.3f}")


# ---------------------------------------------------------------------------
# Branching vs enumerated true posterior
# (reference: tests/test_inference.py:577-692)
# ---------------------------------------------------------------------------


def _fib(n):
    if n < 2:
        return 1
    a, fib = 1, 1
    for _ in range(n - 2):
        a, fib = fib, a + fib
    return fib


class Branching(pp.Model):
    def forward(self):
        count_prior = Poisson(4.0)
        r = pp.sample(count_prior)
        if 4 < float(r):
            l = 6
        else:
            l = 1 + _fib(3 * int(r)) + float(pp.sample(count_prior))
        pp.observe(Poisson(l), name="obs")
        return float(r)

    def true_posterior(self, observe=6):
        count_prior = Poisson(4.0)
        vals, log_weights = [], []
        for r in range(40):
            for s in range(40):
                if 4 < r:
                    l = 6
                else:
                    l = 1 + _fib(3 * r) + s
                vals.append(float(r))
                log_weights.append(
                    float(Poisson(float(l)).log_prob(observe))
                    + float(count_prior.log_prob(r))
                    + float(count_prior.log_prob(s))
                )
        return Empirical(values=vals, log_weights=log_weights)


def _value_categorical(emp, max_val=40):
    probs = np.zeros(max_val + 1)
    w = emp.weights
    for i in range(emp.length):
        v = int(np.asarray(emp._get_value(i)).reshape(-1)[0])
        if 0 <= v <= max_val:
            probs[v] += w[i]
    probs = probs + 1e-9
    return probs / probs.sum()


def _branching_kl(post, true_post):
    p = _value_categorical(post)
    q = _value_categorical(true_post)
    return float(np.sum(np.where(p > 1e-8, p * np.log(p / q), 0.0)))


@pytest.fixture(scope="module")
def branching_true_posterior():
    return Branching().true_posterior()


def test_branching_importance_sampling(branching_true_posterior):
    m = Branching()
    t0 = time.time()
    post = m.posterior_results(IS_SAMPLES, observe={"obs": 6})
    kl = _branching_kl(post, branching_true_posterior)
    assert kl < 0.75, kl
    _record("IS", "Branching", time.time() - t0, f"KL {kl:.4f}")


def test_branching_lmh(branching_true_posterior):
    m = Branching()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        observe={"obs": 6},
    )
    kl = _branching_kl(post, branching_true_posterior)
    assert kl < 0.75, kl
    _record("LMH", "Branching", time.time() - t0, f"KL {kl:.4f}")


def test_branching_rmh(branching_true_posterior):
    m = Branching()
    t0 = time.time()
    post = m.posterior_results(
        MCMC_SAMPLES,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe={"obs": 6},
    )
    kl = _branching_kl(post, branching_true_posterior)
    assert kl < 0.75, kl
    _record("RMH", "Branching", time.time() - t0, f"KL {kl:.4f}")


# ---------------------------------------------------------------------------
# MiniCaptcha: CNN observe embedding, MAP accuracy
# (reference: tests/test_inference.py:695-854)
# ---------------------------------------------------------------------------


def _find_font():
    import matplotlib

    return os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data",
        "fonts",
        "ttf",
        "DejaVuSans-Bold.ttf",
    )


class MiniCaptcha(pp.Model):
    def __init__(self, alphabet=("A", "B", "C", "D", "E", "F"), noise=0.1):
        super().__init__(name="MiniCaptcha")
        self._alphabet = list(alphabet)
        self._noise = noise
        self._images = jnp.stack(
            [jnp.asarray(self.render(a)) for a in self._alphabet]
        )

    @staticmethod
    def render(text, size=18, height=28, width=28, x=6, y=6):
        from PIL import Image, ImageDraw, ImageFont

        pil_font = ImageFont.truetype(_find_font(), size=size)
        canvas = Image.new("RGB", (height, width), (255, 255, 255))
        draw = ImageDraw.Draw(canvas)
        draw.text((x, y), text, font=pil_font, fill="#000000")
        arr = 1.0 - np.asarray(canvas) / 255.0
        return arr[:, :, 0].reshape(-1).astype(np.float32)

    def forward(self):
        probs = jnp.ones(len(self._alphabet)) / len(self._alphabet)
        letter_id = pp.sample(Categorical(probs=probs))
        image = self._images[letter_id]
        likelihood = Normal(image, self._noise)
        pp.observe(likelihood, name="query_image")
        return letter_id


def test_mini_captcha_importance_sampling():
    m = MiniCaptcha()
    test_images = [m.render(a) for a in m._alphabet]
    t0 = time.time()
    correct = 0
    for i, img in enumerate(test_images):
        post = m.posterior_results(
            2000, observe={"query_image": img}, vectorized=True
        )
        if int(np.asarray(post.mode)) == i:
            correct += 1
    accuracy = correct / len(test_images)
    assert accuracy > 0.9  # (reference: tests/test_inference.py:747)
    _record("IS(vec)", "MiniCaptcha", time.time() - t0, f"acc {accuracy:.2f}")


def test_mini_captcha_ic_cnn():
    m = MiniCaptcha()
    test_images = [m.render(a) for a in m._alphabet]
    m.learn_inference_network(
        num_traces=8192,
        observe_embeddings={
            "query_image": {
                "dim": 32,
                "reshape": [1, 28, 28],
                "embedding": pp.ObserveEmbedding.CNN2D5C,
            }
        },
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=128,
        learning_rate_init=0.002,
    )
    t0 = time.time()
    correct = 0
    for i, img in enumerate(test_images):
        post = m.posterior_results(
            512,
            observe={"query_image": img},
            vectorized=True,
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        )
        if int(np.asarray(post.mode)) == i:
            correct += 1
    accuracy = correct / len(test_images)
    assert accuracy > 0.8  # (reference: tests/test_inference.py:777)
    _record("IC-CNN", "MiniCaptcha", time.time() - t0, f"acc {accuracy:.2f}")


def test_mini_captcha_ic_lstm():
    """The second IC variant: LSTM core over the CNN observe embedding —
    accuracy > 0.8 (reference: tests/test_inference.py:780-808)."""
    m = MiniCaptcha()
    test_images = [m.render(a) for a in m._alphabet]
    m.learn_inference_network(
        num_traces=8192,
        observe_embeddings={
            "query_image": {
                "dim": 32,
                "reshape": [1, 28, 28],
                "embedding": pp.ObserveEmbedding.CNN2D5C,
            }
        },
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=128,
        learning_rate_init=0.002,
        lstm_dim=128,
    )
    t0 = time.time()
    correct = 0
    for i, img in enumerate(test_images):
        post = m.posterior_results(
            512,
            observe={"query_image": img},
            vectorized=True,
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        )
        if int(np.asarray(post.mode)) == i:
            correct += 1
    accuracy = correct / len(test_images)
    assert accuracy > 0.8
    _record("IC-LSTM", "MiniCaptcha", time.time() - t0, f"acc {accuracy:.2f}")


def _mini_captcha_mcmc(engine, label):
    """MAP accuracy > 0.9 via per-letter chains with duplicate-combined mode
    (reference: tests/test_inference.py:810-853)."""
    m = MiniCaptcha()
    test_images = [m.render(a) for a in m._alphabet]
    samples = 834  # 5000 / |alphabet| (reference: tests/test_inference.py:811)
    burn_in = 84
    t0 = time.time()
    correct = 0
    for i, img in enumerate(test_images):
        post = m.posterior_results(
            samples, observe={"query_image": img}, inference_engine=engine
        )[burn_in:]
        if int(np.asarray(post.combine_duplicates().mode)) == i:
            correct += 1
    accuracy = correct / len(test_images)
    assert accuracy > 0.9
    _record(label, "MiniCaptcha", time.time() - t0, f"acc {accuracy:.2f}")


def test_mini_captcha_lmh():
    _mini_captcha_mcmc(
        pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS, "LMH"
    )


def test_mini_captcha_rmh():
    _mini_captcha_mcmc(
        pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS, "RMH"
    )
