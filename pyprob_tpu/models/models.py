"""Canonical model families.

* GaussianUnknownMean — conjugate 1-latent model with analytic posterior;
  fully jax-traceable (compiled tier).
* GaussianUnknownMeanMarsaglia — the same posterior via an unbounded
  rejection sampler: the universal-PPL stress model (interpreter tier).
* HiddenMarkovModel — K-state chain with Gaussian emissions, written with
  jnp indexing so it compiles (reference: tests/test_inference.py:413-460).
* Branching — Poisson/fibonacci stochastic branching with an enumerable
  posterior (reference: tests/test_inference.py:577-692).
* MiniCaptcha — rendered-letter inversion with a CNN observe embedding
  (reference: tests/test_inference.py:695-854).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp

from .. import state as _state
from ..model import Model
from ..distributions import (
    Categorical,
    HalfCauchy,
    Normal,
    Poisson,
    Uniform,
    Empirical,
)

sample = _state.sample
observe = _state.observe


class GaussianUnknownMean(Model):
    def __init__(
        self, prior_mean=1.0, prior_stddev=math.sqrt(5.0), likelihood_stddev=math.sqrt(2.0), num_observes=2
    ):
        super().__init__(name="Gaussian with unknown mean")
        self.prior_mean = prior_mean
        self.prior_stddev = prior_stddev
        self.likelihood_stddev = likelihood_stddev
        self.num_observes = num_observes

    def forward(self):
        mu = sample(Normal(self.prior_mean, self.prior_stddev))
        likelihood = Normal(mu, self.likelihood_stddev)
        for i in range(self.num_observes):
            observe(likelihood, name=f"obs{i}")
        return mu

    def true_posterior(self, observed_values):
        """Conjugate closed form."""
        n = len(observed_values)
        s2_prior = self.prior_stddev**2
        s2_lik = self.likelihood_stddev**2
        var = 1.0 / (1.0 / s2_prior + n / s2_lik)
        mean = var * (self.prior_mean / s2_prior + sum(observed_values) / s2_lik)
        return Normal(mean, math.sqrt(var))


class GaussianUnknownMeanMarsaglia(Model):
    def __init__(
        self, prior_mean=1.0, prior_stddev=math.sqrt(5.0), likelihood_stddev=math.sqrt(2.0)
    ):
        super().__init__(name="Gaussian with unknown mean (Marsaglia)")
        self.prior_mean = prior_mean
        self.prior_stddev = prior_stddev
        self.likelihood_stddev = likelihood_stddev

    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)
        while True:
            x = sample(uniform)
            y = sample(uniform)
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                return mean + stddev * (float(x) * math.sqrt(-2 * math.log(s) / s))

    def forward(self):
        mu = self.marsaglia(self.prior_mean, self.prior_stddev)
        likelihood = Normal(mu, self.likelihood_stddev)
        observe(likelihood, name="obs0")
        observe(likelihood, name="obs1")
        return mu


class GaussianUnknownMeanMarsagliaRejection(Model):
    """GUM-Marsaglia written with the ``rejection_sample`` combinator, so
    the rejection loop compiles to a ``lax.while_loop`` and the model runs
    on the compiled tier (full particle batches) — the plain while-loop
    variant above is interpreter-only.  Same posterior as
    GaussianUnknownMean (reference: tests/test_inference.py:249-310)."""

    def __init__(
        self, prior_mean=1.0, prior_stddev=math.sqrt(5.0), likelihood_stddev=math.sqrt(2.0)
    ):
        super().__init__(
            name="Gaussian with unknown mean (Marsaglia, rejection combinator)"
        )
        self.prior_mean = prior_mean
        self.prior_stddev = prior_stddev
        self.likelihood_stddev = likelihood_stddev

    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)

        def attempt():
            x = sample(uniform)
            y = sample(uniform)
            s = x * x + y * y
            return (x, s), s < 1.0

        (x, s) = _state.rejection_sample(attempt)
        B = jnp if hasattr(x, "aval") or isinstance(x, jnp.ndarray) else np
        return mean + stddev * (x * B.sqrt(-2.0 * B.log(s) / s))

    def forward(self):
        mu = self.marsaglia(self.prior_mean, self.prior_stddev)
        likelihood = Normal(mu, self.likelihood_stddev)
        observe(likelihood, name="obs0")
        observe(likelihood, name="obs1")
        return mu

    def true_posterior(self, observed_values):
        return GaussianUnknownMean(
            self.prior_mean, self.prior_stddev, self.likelihood_stddev
        ).true_posterior(observed_values)


class HiddenMarkovModel(Model):
    def __init__(
        self,
        init_probs,
        transition_probs,
        emission_means,
        emission_stddev=1.0,
        obs_length=16,
    ):
        super().__init__(name="Hidden Markov model")
        self.init_probs = jnp.asarray(init_probs, jnp.float32)
        self.T = jnp.asarray(transition_probs, jnp.float32)
        self.means = jnp.asarray(emission_means, jnp.float32)
        self.emission_stddev = emission_stddev
        self.obs_length = obs_length

    def forward(self):
        import jax.nn

        state = sample(Categorical(probs=self.init_probs))
        states = [state]
        for t in range(self.obs_length):
            state = sample(Categorical(probs=self.T[state]))
            observe(
                Normal(self.means[state], self.emission_stddev), name=f"obs{t}"
            )
            states.append(state)
        return jax.nn.one_hot(jnp.stack(states), self.init_probs.shape[-1])


def _fib(n):
    if n < 2:
        return 1
    a, fib = 1, 1
    for _ in range(n - 2):
        a, fib = fib, a + fib
    return fib


class Branching(Model):
    def __init__(self, rate=4.0):
        super().__init__(name="Branching")
        self.rate = rate

    def forward(self):
        count_prior = Poisson(self.rate)
        r = sample(count_prior)
        if 4 < float(r):
            l = 6
        else:
            l = 1 + _fib(3 * int(r)) + float(sample(count_prior))
        observe(Poisson(l), name="obs")
        return float(r)

    def true_posterior(self, observe_value=6, support=40):
        count_prior = Poisson(self.rate)
        vals, log_weights = [], []
        for r in range(support):
            for s in range(support):
                l = 6 if 4 < r else 1 + _fib(3 * r) + s
                vals.append(float(r))
                log_weights.append(
                    float(Poisson(float(l)).log_prob(observe_value))
                    + float(count_prior.log_prob(r))
                    + float(count_prior.log_prob(s))
                )
        return Empirical(values=vals, log_weights=log_weights)


class BranchingCompiled(Model):
    """Branching with tensorized control flow: the data-dependent branch
    becomes ``where`` + a precomputed fib table, so the model compiles to
    the vectorized tier (the reference's Branching, like ours above, is
    interpreter-only Python).  The second count is sampled unconditionally
    (the original draws it only on one branch); it is ignored by the
    likelihood when r > 4, which marginalizes out exactly, so the
    posterior over r is identical — compare against
    ``Branching.true_posterior``."""

    def __init__(self, rate=4.0, max_r=40):
        super().__init__(name="Branching (compiled)")
        self.rate = rate
        self.max_r = max_r
        self._fib3 = np.asarray(
            [_fib(3 * r) for r in range(max_r + 1)], np.float32
        )

    def forward(self):
        count_prior = Poisson(self.rate)
        r = sample(count_prior)
        s = sample(count_prior)
        B = jnp if hasattr(r, "aval") else np
        idx = B.clip(r, 0, self.max_r).astype(B.int32)
        l = B.where(
            r > 4.0, B.asarray(6.0, B.float32), 1.0 + B.asarray(self._fib3)[idx] + s
        )
        observe(Poisson(l), name="obs")
        return r

    def true_posterior(self, observe_value=6, support=40):
        return Branching(self.rate).true_posterior(observe_value, support)


class VariableLengthGaussian(Model):
    """A random number of the MAX_N observation slots apply: n ~
    Uniform{1..max_n}; mu ~ Normal(prior); obs_t active iff t < n — written
    as a fixed-bound masked loop so the model compiles (the masking
    primitive's canonical pattern; analytic posterior = a mixture over n
    of conjugate posteriors weighted by per-length marginal likelihoods)."""

    def __init__(
        self,
        max_n=3,
        prior_mean=1.0,
        prior_stddev=math.sqrt(5.0),
        likelihood_stddev=math.sqrt(2.0),
    ):
        super().__init__(name="Variable-length Gaussian (masked)")
        self.max_n = int(max_n)
        self.prior_mean = prior_mean
        self.prior_stddev = prior_stddev
        self.likelihood_stddev = likelihood_stddev

    def forward(self):
        n = sample(Categorical(probs=jnp.ones(self.max_n) / self.max_n)) + 1
        mu = sample(Normal(self.prior_mean, self.prior_stddev))
        likelihood = Normal(mu, self.likelihood_stddev)
        for t in range(self.max_n):
            observe(likelihood, name=f"obs{t}", mask=t < n)
        return mu

    def true_posterior(self, observed_values):
        """Mixture over n of conjugate posteriors, weights p(n) p(y_1..n|n).
        Returns (means, stddevs, weights) per n."""
        comps, log_ws = [], []
        for n in range(1, self.max_n + 1):
            m, v = self.prior_mean, self.prior_stddev**2
            s2 = self.likelihood_stddev**2
            log_ml = 0.0
            for y in observed_values[:n]:
                log_ml += -0.5 * math.log(2 * math.pi * (v + s2)) - 0.5 * (
                    y - m
                ) ** 2 / (v + s2)
                pv = 1.0 / (1.0 / v + 1.0 / s2)
                m = pv * (m / v + y / s2)
                v = pv
            comps.append((m, math.sqrt(v)))
            log_ws.append(math.log(1.0 / self.max_n) + log_ml)
        ws = np.exp(np.asarray(log_ws) - max(log_ws))
        ws = ws / ws.sum()
        return (
            np.asarray([c[0] for c in comps]),
            np.asarray([c[1] for c in comps]),
            ws,
        )

    def true_posterior_moments(self, observed_values):
        means, stds, ws = self.true_posterior(observed_values)
        mean = float((ws * means).sum())
        second = float((ws * (stds**2 + means**2)).sum())
        return mean, math.sqrt(second - mean**2)


def _default_font():
    import matplotlib

    return os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data",
        "fonts",
        "ttf",
        "DejaVuSans-Bold.ttf",
    )


class MiniCaptcha(Model):
    def __init__(self, alphabet=("A", "B", "C", "D", "E", "F"), noise=0.1, font=None):
        super().__init__(name="MiniCaptcha")
        self._alphabet = list(alphabet)
        self._noise = noise
        self._font = font or _default_font()
        self._images = jnp.stack(
            [jnp.asarray(self.render(a)) for a in self._alphabet]
        )

    @property
    def alphabet(self):
        return self._alphabet

    def render(self, text, size=18, height=28, width=28, x=6, y=6):
        from PIL import Image, ImageDraw, ImageFont

        pil_font = ImageFont.truetype(self._font, size=size)
        canvas = Image.new("RGB", (height, width), (255, 255, 255))
        draw = ImageDraw.Draw(canvas)
        draw.text((x, y), text, font=pil_font, fill="#000000")
        arr = 1.0 - np.asarray(canvas) / 255.0
        return arr[:, :, 0].reshape(-1).astype(np.float32)

    def forward(self):
        probs = jnp.ones(len(self._alphabet)) / len(self._alphabet)
        letter_id = sample(Categorical(probs=probs))
        image = self._images[letter_id]
        observe(Normal(image, self._noise), name="query_image")
        return letter_id


class EightSchools(Model):
    """The canonical Bayesian hierarchical benchmark (Rubin 1981; Gelman et
    al., BDA §5.5): eight schools' treatment effects with known standard
    errors, partial pooling through a population mean and scale.

    Written in the non-centered parameterization (theta = mu + tau * z,
    z ~ N(0,1)) so the funnel geometry stays tractable for the gradient
    engines; runs on the compiled tier under every engine.  Observe names
    are ``y0..y7`` — ``observes()`` returns the classic data dict.
    forward() returns [mu, tau]."""

    Y = (28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0)
    SIGMA = (15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0)

    def __init__(self, sigma=None):
        super().__init__(name="Eight schools (non-centered)")
        self.sigma = tuple(sigma) if sigma is not None else self.SIGMA

    def observes(self):
        """The classic dataset as an observe dict."""
        return {f"y{i}": v for i, v in enumerate(self.Y)}

    def forward(self):
        mu = sample(Normal(0.0, 5.0), name="mu")
        tau = sample(HalfCauchy(5.0), name="tau")
        B = jnp if hasattr(mu, "aval") or isinstance(mu, jnp.ndarray) else np
        for i, s in enumerate(self.sigma):
            z = sample(Normal(0.0, 1.0), address=f"z{i}")
            observe(Normal(mu + tau * z, s), name=f"y{i}")
        return B.stack([mu, tau])
