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

Beyond the reference set (each with analytic or grid ground truth):
VariableLengthGaussian, EightSchools, BayesianLinearRegression,
BayesianLogisticRegression, GaussianProcessRegression, GaussianMixture
(label-switching multimodal — the PT showcase), and
LinearGaussianStateSpace (Kalman/RTS ground truth — the SMC showcase).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp

from .. import state as _state
from ..model import Model
from ..markov import MarkovModel
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


class BayesianLinearRegression(Model):
    """Bayesian linear regression with known noise: w_j ~ N(0, tau^2) per
    coefficient (sites ``w0..w{D-1}``), y ~ N(X w, sigma^2 I) observed as
    ONE vector observe ``y`` — the whole likelihood is a single [N,D]@[D]
    matmul per particle, so vmapped particle batches tile onto the MXU.
    Conjugate: the exact posterior is Gaussian (``true_posterior()``), so
    the Laplace engine is exact on this family and every other engine can
    be validated against closed-form moments.  (Reference pyprob ships no
    regression family; model-family parity anchors live in
    reference tests/test_inference.py.)"""

    def __init__(self, X, prior_stddev=1.0, noise_stddev=0.5):
        super().__init__(name="Bayesian linear regression")
        self.X = np.asarray(X, dtype=np.float64)
        if self.X.ndim != 2:
            raise ValueError("X must be [num_data, num_features]")
        self.num_data, self.num_features = self.X.shape
        self.prior_stddev = float(prior_stddev)
        self.noise_stddev = float(noise_stddev)
        self._Xj = jnp.asarray(self.X, dtype=jnp.float32)

    def forward(self):
        ws = [
            sample(Normal(0.0, self.prior_stddev), address=f"w{j}")
            for j in range(self.num_features)
        ]
        B = jnp if any(hasattr(w, "aval") for w in ws) else np
        w = B.stack(ws)
        Xm = self._Xj if B is jnp else self.X
        observe(Normal(Xm @ w, self.noise_stddev), name="y")
        return w

    def true_posterior(self, y):
        """Exact Gaussian posterior: mean vector and covariance matrix."""
        y = np.asarray(y, dtype=np.float64)
        prec = self.X.T @ self.X / self.noise_stddev**2 + np.eye(
            self.num_features
        ) / self.prior_stddev**2
        cov = np.linalg.inv(prec)
        mean = cov @ (self.X.T @ y) / self.noise_stddev**2
        return mean, cov

    def synthesize(self, w_true, rng=None):
        """Draw a dataset y = X w_true + noise (host numpy)."""
        rng = np.random.default_rng(rng)
        return self.X @ np.asarray(w_true, dtype=np.float64) + rng.normal(
            0.0, self.noise_stddev, size=self.num_data
        )


class BayesianLogisticRegression(Model):
    """Bayesian logistic regression: w_j ~ N(0, tau^2), y ~
    Bernoulli(sigmoid(X w)) observed as one vector observe ``y``.  No
    conjugate posterior; ``true_posterior_moments()`` grid-integrates the
    exact posterior for num_features <= 2 to validate the gradient
    engines on a non-Gaussian (but log-concave) target."""

    def __init__(self, X, prior_stddev=2.0):
        super().__init__(name="Bayesian logistic regression")
        self.X = np.asarray(X, dtype=np.float64)
        if self.X.ndim != 2:
            raise ValueError("X must be [num_data, num_features]")
        self.num_data, self.num_features = self.X.shape
        self.prior_stddev = float(prior_stddev)
        self._Xj = jnp.asarray(self.X, dtype=jnp.float32)

    def forward(self):
        from ..distributions import Bernoulli

        ws = [
            sample(Normal(0.0, self.prior_stddev), address=f"w{j}")
            for j in range(self.num_features)
        ]
        B = jnp if any(hasattr(w, "aval") for w in ws) else np
        w = B.stack(ws)
        Xm = self._Xj if B is jnp else self.X
        observe(Bernoulli(logits=Xm @ w), name="y")
        return w

    def _log_post(self, w, y):
        logits = self.X @ w
        loglik = np.sum(y * logits - np.logaddexp(0.0, logits))
        logprior = -0.5 * np.sum(w**2) / self.prior_stddev**2
        return loglik + logprior

    def true_posterior_moments(self, y, lim=8.0, n=401):
        """Grid-integrated exact posterior mean/stddev per coefficient
        (num_features <= 2 only)."""
        y = np.asarray(y, dtype=np.float64)
        grid = np.linspace(-lim, lim, n)
        if self.num_features == 1:
            lp = np.array([self._log_post(np.array([g]), y) for g in grid])
            p = np.exp(lp - lp.max())
            p /= p.sum()
            mean = float(np.sum(p * grid))
            var = float(np.sum(p * (grid - mean) ** 2))
            return np.array([mean]), np.array([math.sqrt(var)])
        if self.num_features == 2:
            G0, G1 = np.meshgrid(grid, grid, indexing="ij")
            lp = np.empty_like(G0)
            for i in range(n):
                for j in range(n):
                    lp[i, j] = self._log_post(
                        np.array([G0[i, j], G1[i, j]]), y
                    )
            p = np.exp(lp - lp.max())
            p /= p.sum()
            means = np.array([np.sum(p * G0), np.sum(p * G1)])
            stds = np.array(
                [
                    math.sqrt(np.sum(p * (G0 - means[0]) ** 2)),
                    math.sqrt(np.sum(p * (G1 - means[1]) ** 2)),
                ]
            )
            return means, stds
        raise ValueError("grid ground truth implemented for D <= 2")

    def synthesize(self, w_true, rng=None):
        rng = np.random.default_rng(rng)
        p = 1.0 / (1.0 + np.exp(-(self.X @ np.asarray(w_true, np.float64))))
        return (rng.uniform(size=self.num_data) < p).astype(np.float64)


class GaussianProcessRegression(Model):
    """GP regression with the latent function marginalized out: the
    latents are the kernel hyperparameters (log-lengthscale,
    log-amplitude, log-noise — any subset learnable, the rest fixed) and
    the likelihood is one MultivariateNormal observe ``y`` over the full
    dataset, y ~ N(0, amp^2 exp(-d^2/2ell^2) + noise^2 I).  Each particle
    builds an [N,N] kernel and factorizes it — Cholesky + triangular
    solve, the MXU/VPU-dense showcase model of the built-in set.  The
    exact single-hyperparameter posterior is available by grid
    integration (``true_posterior_moments``)."""

    LEARNABLE = ("lengthscale", "amplitude", "noise")

    def __init__(
        self,
        x,
        learn=("lengthscale",),
        lengthscale=1.0,
        amplitude=1.0,
        noise=0.1,
        prior_mean=0.0,
        prior_stddev=1.0,
    ):
        super().__init__(name="GP regression (marginal likelihood)")
        self.x = np.asarray(x, dtype=np.float64).reshape(-1)
        self.num_data = self.x.size
        unknown = set(learn) - set(self.LEARNABLE)
        if unknown:
            raise ValueError(f"unknown hyperparameters: {sorted(unknown)}")
        self.learn = tuple(learn)
        self.fixed = dict(
            lengthscale=float(lengthscale),
            amplitude=float(amplitude),
            noise=float(noise),
        )
        self.prior_mean = float(prior_mean)
        self.prior_stddev = float(prior_stddev)
        d = self.x[:, None] - self.x[None, :]
        self._sq_dists = d * d
        self._sq_dists_j = jnp.asarray(self._sq_dists, dtype=jnp.float32)

    def _hyper(self, name, B):
        """Sample log-hyperparameter if learnable, else its fixed value."""
        if name in self.learn:
            lg = sample(
                Normal(self.prior_mean, self.prior_stddev),
                address=f"log_{name}",
            )
            return B.exp(lg)
        return self.fixed[name]

    def _cov(self, B, sq, ell, amp, noise):
        K = (amp * amp) * B.exp(-0.5 * sq / (ell * ell))
        return K + (noise * noise + 1e-6) * B.eye(self.num_data)

    def forward(self):
        from ..distributions import MultivariateNormal

        # probe tier with the first learnable hyperparameter
        first = sample(
            Normal(self.prior_mean, self.prior_stddev),
            address=f"log_{self.learn[0]}",
        )
        B = jnp if hasattr(first, "aval") else np
        vals = {self.learn[0]: B.exp(first)}
        for name in self.LEARNABLE:
            if name not in vals:
                vals[name] = self._hyper(name, B)
        sq = self._sq_dists_j if B is jnp else self._sq_dists
        cov = self._cov(
            B, sq, vals["lengthscale"], vals["amplitude"], vals["noise"]
        )
        loc = B.zeros(self.num_data)
        observe(MultivariateNormal(loc, covariance_matrix=cov), name="y")
        return B.stack([B.log(vals[n]) for n in self.learn])

    def _log_marglik(self, y, ell, amp, noise):
        K = self._cov(np, self._sq_dists, ell, amp, noise)
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(L, y)
        return (
            -0.5 * alpha @ alpha
            - np.sum(np.log(np.diag(L)))
            - 0.5 * self.num_data * math.log(2 * math.pi)
        )

    def true_posterior_moments(self, y, lim=3.0, n=241):
        """Grid-integrated posterior mean/stddev of the single learned
        log-hyperparameter (len(learn) == 1 only)."""
        if len(self.learn) != 1:
            raise ValueError("grid ground truth needs exactly one learnable")
        y = np.asarray(y, dtype=np.float64)
        name = self.learn[0]
        grid = np.linspace(
            self.prior_mean - lim * self.prior_stddev,
            self.prior_mean + lim * self.prior_stddev,
            n,
        )
        lp = np.empty(n)
        for i, g in enumerate(grid):
            vals = dict(self.fixed)
            vals[name] = math.exp(g)
            lp[i] = self._log_marglik(
                y, vals["lengthscale"], vals["amplitude"], vals["noise"]
            ) - 0.5 * (g - self.prior_mean) ** 2 / self.prior_stddev**2
        p = np.exp(lp - lp.max())
        p /= p.sum()
        mean = float(np.sum(p * grid))
        var = float(np.sum(p * (grid - mean) ** 2))
        return mean, math.sqrt(var)

    def synthesize(self, rng=None, **hyper):
        """Draw y from the GP prior at the fixed (or given) hyperparams."""
        vals = dict(self.fixed)
        vals.update(hyper)
        K = self._cov(
            np,
            self._sq_dists,
            vals["lengthscale"],
            vals["amplitude"],
            vals["noise"],
        )
        rng = np.random.default_rng(rng)
        return np.linalg.cholesky(K) @ rng.normal(size=self.num_data)


class GaussianMixture(Model):
    """K-component 1-D Gaussian mixture with unknown component means:
    mu_k ~ N(prior_mean, prior_stddev) (sites ``mu0..mu{K-1}``), y_i ~
    sum_k w_k N(mu_k, sigma) observed as ONE batched Mixture observe
    ``y`` (assignments marginalized analytically, so the model is fully
    continuous and every gradient engine runs).  With exchangeable
    priors the posterior is K!-fold label-switching multimodal — the
    parallel-tempering showcase model.  Optional ``learn_weights=True``
    adds a Dirichlet(alpha) weight latent (site ``w``) exercising the
    stick-breaking transform.  Exact K=2 fixed-weight posterior by grid
    integration (``true_posterior_moments``).  (No reference
    counterpart; closest anchor is the enumerable-branching family,
    reference tests/test_inference.py:577-692.)"""

    def __init__(
        self,
        num_components=2,
        weights=None,
        obs_stddev=0.6,
        prior_mean=0.0,
        prior_stddev=3.0,
        num_data=30,
        learn_weights=False,
        dirichlet_alpha=2.0,
    ):
        super().__init__(name="Gaussian mixture (marginalized assignments)")
        self.num_components = int(num_components)
        if weights is None:
            weights = np.full(self.num_components, 1.0 / self.num_components)
        self.weights = np.asarray(weights, dtype=np.float64)
        if self.weights.shape != (self.num_components,):
            raise ValueError("weights must have shape [num_components]")
        self.obs_stddev = float(obs_stddev)
        self.prior_mean = float(prior_mean)
        self.prior_stddev = float(prior_stddev)
        self.num_data = int(num_data)
        self.learn_weights = bool(learn_weights)
        self.dirichlet_alpha = float(dirichlet_alpha)

    def forward(self):
        from ..distributions import Dirichlet, Mixture

        mus = [
            sample(Normal(self.prior_mean, self.prior_stddev), address=f"mu{k}")
            for k in range(self.num_components)
        ]
        B = jnp if any(hasattr(m, "aval") for m in mus) else np
        if self.learn_weights:
            w = sample(
                Dirichlet(B.full(self.num_components, self.dirichlet_alpha)),
                address="w",
            )
            probs = w
        else:
            probs = B.asarray(self.weights)
        comps = [
            Normal(B.broadcast_to(m, (self.num_data,)), self.obs_stddev)
            for m in mus
        ]
        observe(Mixture(comps, probs=probs), name="y")
        return B.stack(mus)

    def _log_post(self, mus, y):
        lps = np.stack(
            [
                -0.5 * ((y - m) / self.obs_stddev) ** 2
                - math.log(self.obs_stddev)
                - 0.5 * math.log(2 * math.pi)
                + math.log(wk)
                for m, wk in zip(mus, self.weights)
            ],
            axis=-1,
        )
        loglik = np.sum(_logsumexp(lps, axis=-1))
        logprior = -0.5 * np.sum(
            ((np.asarray(mus) - self.prior_mean) / self.prior_stddev) ** 2
        )
        return loglik + logprior

    def true_posterior_moments(self, y, lim=3.0, n=201):
        """Grid-integrated exact posterior over (mu0, mu1) for K=2 fixed
        weights; returns (means[2], stddevs[2]).  The grid covers the
        full label-switching posterior, so with symmetric priors the
        means of the two sites coincide — compare mode-aware summaries
        (e.g. per-mode conditional means) for sharper checks."""
        if self.num_components != 2 or self.learn_weights:
            raise ValueError("grid ground truth: K=2 fixed weights only")
        y = np.asarray(y, dtype=np.float64)
        grid = np.linspace(
            self.prior_mean - lim * self.prior_stddev,
            self.prior_mean + lim * self.prior_stddev,
            n,
        )
        G0, G1 = np.meshgrid(grid, grid, indexing="ij")
        lp = np.empty_like(G0)
        for i in range(n):
            for j in range(n):
                lp[i, j] = self._log_post([G0[i, j], G1[i, j]], y)
        p = np.exp(lp - lp.max())
        p /= p.sum()
        means = np.array([np.sum(p * G0), np.sum(p * G1)])
        stds = np.sqrt(
            [np.sum(p * (G0 - means[0]) ** 2), np.sum(p * (G1 - means[1]) ** 2)]
        )
        return means, stds

    def synthesize(self, mus_true, rng=None, weights=None):
        """Draw a dataset from the mixture at the given component means."""
        rng = np.random.default_rng(rng)
        w = self.weights if weights is None else np.asarray(weights)
        idx = rng.choice(self.num_components, size=self.num_data, p=w / w.sum())
        mus_true = np.asarray(mus_true, dtype=np.float64)
        return mus_true[idx] + rng.normal(0, self.obs_stddev, self.num_data)


def _logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    return np.squeeze(m, axis=axis) + np.log(
        np.sum(np.exp(a - m), axis=axis)
    )


class LinearGaussianStateSpace(Model):
    """Linear-Gaussian state-space model (local-level / AR(1)):
    x_0 ~ N(0, p0), x_t ~ N(a x_{t-1}, q), y_t ~ N(x_t, r) observed at
    every step (sites ``x0..x{T}``, observes ``y0..y{T-1}``).  forward()
    returns the full state path [T+1], so a trace posterior's mean is
    the SMOOTHED path — validated against the exact Kalman filter
    (``kalman_filter``) and RTS smoother (``kalman_smoother``).  The
    canonical SMC-vs-IS degeneracy benchmark: plain IS collapses over T
    observes while the staged particle filter keeps ESS healthy
    (reference has no SSM family; the pattern anchors SMC correctness,
    see tests/test_smc.py here)."""

    def __init__(self, num_steps=8, a=1.0, init_stddev=1.0,
                 transition_stddev=math.sqrt(0.5),
                 observation_stddev=math.sqrt(0.3)):
        super().__init__(name="Linear-Gaussian state space")
        self.num_steps = int(num_steps)
        self.a = float(a)
        self.init_stddev = float(init_stddev)
        self.transition_stddev = float(transition_stddev)
        self.observation_stddev = float(observation_stddev)

    def forward(self):
        xs = [sample(Normal(0.0, self.init_stddev), address="x0")]
        for t in range(self.num_steps):
            xs.append(
                sample(
                    Normal(self.a * xs[-1], self.transition_stddev),
                    address=f"x{t + 1}",
                )
            )
            observe(
                Normal(xs[-1], self.observation_stddev), name=f"y{t}"
            )
        B = jnp if any(hasattr(x, "aval") for x in xs) else np
        return B.stack(xs)

    def observes(self, ys):
        return {f"y{t}": float(v) for t, v in enumerate(ys)}

    def kalman_filter(self, ys):
        """Exact filtering means/vars of x_1..x_T given y_1..y_t (each
        entry conditions on observations up to and including its own
        step).  Returns (means[T], vars[T])."""
        q, r = self.transition_stddev**2, self.observation_stddev**2
        mean, var = 0.0, self.init_stddev**2
        means, vars_ = [], []
        for y in np.asarray(ys, dtype=np.float64):
            mean_p = self.a * mean
            var_p = self.a * self.a * var + q
            k = var_p / (var_p + r)
            mean = mean_p + k * (y - mean_p)
            var = (1 - k) * var_p
            means.append(mean)
            vars_.append(var)
        return np.array(means), np.array(vars_)

    def kalman_smoother(self, ys):
        """Exact smoothing means/vars of x_0..x_T given ALL observations
        (Rauch-Tung-Striebel).  Returns (means[T+1], vars[T+1]) aligned
        with forward()'s returned path."""
        q, r = self.transition_stddev**2, self.observation_stddev**2
        ys = np.asarray(ys, dtype=np.float64)
        T = len(ys)
        # forward pass over x_0..x_T (x_0 is unobserved)
        fm = np.empty(T + 1)
        fv = np.empty(T + 1)
        pm = np.empty(T + 1)  # predicted (prior to update) at each step
        pv = np.empty(T + 1)
        fm[0], fv[0] = 0.0, self.init_stddev**2
        pm[0], pv[0] = fm[0], fv[0]
        for t in range(T):
            pm[t + 1] = self.a * fm[t]
            pv[t + 1] = self.a * self.a * fv[t] + q
            k = pv[t + 1] / (pv[t + 1] + r)
            fm[t + 1] = pm[t + 1] + k * (ys[t] - pm[t + 1])
            fv[t + 1] = (1 - k) * pv[t + 1]
        sm = fm.copy()
        sv = fv.copy()
        for t in range(T - 1, -1, -1):
            c = fv[t] * self.a / pv[t + 1]
            sm[t] = fm[t] + c * (sm[t + 1] - pm[t + 1])
            sv[t] = fv[t] + c * c * (sv[t + 1] - pv[t + 1])
        return sm, sv

    def synthesize(self, rng=None):
        """Draw (states[T+1], observations[T]) from the prior."""
        rng = np.random.default_rng(rng)
        xs = [rng.normal(0.0, self.init_stddev)]
        ys = []
        for _ in range(self.num_steps):
            xs.append(self.a * xs[-1] + rng.normal(0.0, self.transition_stddev))
            ys.append(xs[-1] + rng.normal(0.0, self.observation_stddev))
        return np.array(xs), np.array(ys)

    def kalman_log_evidence(self, ys):
        """Exact log marginal likelihood log p(y_1..y_T): the sum of
        one-step predictive log-densities from the Kalman recursion —
        ground truth for SMC's log_evidence estimate."""
        q, r = self.transition_stddev**2, self.observation_stddev**2
        mean, var = 0.0, self.init_stddev**2
        log_z = 0.0
        for y in np.asarray(ys, dtype=np.float64):
            mean_p = self.a * mean
            var_p = self.a * self.a * var + q
            s = var_p + r
            log_z += -0.5 * (
                math.log(2 * math.pi * s) + (y - mean_p) ** 2 / s
            )
            k = var_p / s
            mean = mean_p + k * (y - mean_p)
            var = (1 - k) * var_p
        return log_z


class LinearGaussianStateSpaceMarkov(MarkovModel):
    """The same local-level model as :class:`LinearGaussianStateSpace`,
    declared through the markov protocol so SMC runs the O(T) lax.scan
    filter (pyprob_tpu.inference.smc_scan) instead of O(T^2) staged
    replay.  The carry is the current state x_t; ``markov_finalize``
    returns x_T, so the SMC posterior targets the FILTERING distribution
    p(x_T | y_{1:T}) — validated against the exact Kalman filter.  The
    per-step observation is a single array: ``observe={"y": ys[T]}``.
    Every other engine sees the derived ``forward()`` (the plain loop)
    and works unchanged."""

    def __init__(self, num_steps=8, a=1.0, init_stddev=1.0,
                 transition_stddev=math.sqrt(0.5),
                 observation_stddev=math.sqrt(0.3)):
        super().__init__(
            num_steps=num_steps,
            name="Linear-Gaussian state space (markov)",
        )
        self.a = float(a)
        self.init_stddev = float(init_stddev)
        self.transition_stddev = float(transition_stddev)
        self.observation_stddev = float(observation_stddev)
        # exact ground truth shared with the staged-replay variant
        self._exact = LinearGaussianStateSpace(
            num_steps=num_steps, a=a, init_stddev=init_stddev,
            transition_stddev=transition_stddev,
            observation_stddev=observation_stddev,
        )

    def markov_init(self):
        return sample(Normal(0.0, self.init_stddev), address="x0")

    def markov_step(self, x, t):
        x = sample(Normal(self.a * x, self.transition_stddev), address="x")
        observe(Normal(x, self.observation_stddev), name="y")
        return x

    def observes(self, ys):
        return {"y": np.asarray(ys, dtype=np.float64)}

    def kalman_filter(self, ys):
        return self._exact.kalman_filter(ys)

    def kalman_smoother(self, ys):
        return self._exact.kalman_smoother(ys)

    def kalman_log_evidence(self, ys):
        return self._exact.kalman_log_evidence(ys)

    def synthesize(self, rng=None):
        return self._exact.synthesize(rng)
