"""Transformation checkers: decide when the ICP loop stops.

Capability parity with the reference checker layer
(reference: PointMatcher.h:580-618, TransformationCheckersImpl.{h,cpp}).
Chain semantics are OR — any checker requesting a stop ends the loop
(reference: TransformationChecker.cpp).

TPU design: the reference signals through a mutable ``iterate`` flag plus
exceptions (``MaxNumIterationsReached`` caught by the loop, ICP.cpp:419-427;
``ConvergenceError`` propagating out). Inside ``lax.while_loop`` both become
data: each checker is a pure function ``(state, T, iteration) → (state, stop,
code)`` where ``code`` is 0 (keep going / clean stop), CODE_MAX_ITER (stop,
sets the maxNumIterationsReached flag), CODE_NAN_ERROR or CODE_BOUND_ERROR
(stop; the engine re-raises ``ConvergenceError`` on the host afterwards)."""

from __future__ import annotations

import jax.numpy as jnp

from .registry import Param, Parametrizable, Registrar
from .utils import se3

__all__ = [
    "TransformationChecker",
    "TransformationCheckerRegistrar",
    "CounterTransformationChecker",
    "DifferentialTransformationChecker",
    "BoundTransformationChecker",
    "CODE_MAX_ITER",
    "CODE_NAN_ERROR",
    "CODE_BOUND_ERROR",
]

TransformationCheckerRegistrar = Registrar("TransformationChecker")

CODE_MAX_ITER = 1
CODE_NAN_ERROR = 2
CODE_BOUND_ERROR = 3


class TransformationChecker(Parametrizable):
    """Interface (reference: PointMatcher.h:580-618)."""

    # introspection parity (reference: limitNames/conditionVariableNames)
    limit_names: tuple = ()
    condition_names: tuple = ()

    def init_state(self, T0):
        return ()

    def check(self, state, T, iteration):
        """→ (state, stop: bool scalar, code: int32 scalar)."""
        raise NotImplementedError


@TransformationCheckerRegistrar.register
class CounterTransformationChecker(TransformationChecker):
    """Stop after maxIterationCount iterations, flagging
    maxNumIterationsReached (reference: TransformationCheckersImpl.cpp:46-76)."""

    PARAMS = (
        Param("maxIterationCount", "maximum number of iterations", int, 40,
              min=0),
    )
    limit_names = ("Max iteration",)
    condition_names = ("Iteration",)

    def init_state(self, T0):
        return jnp.int32(0)

    def check(self, state, T, iteration):
        count = state + 1
        stop = count >= self.maxIterationCount
        code = jnp.where(stop, CODE_MAX_ITER, 0).astype(jnp.int32)
        return count, stop, code


@TransformationCheckerRegistrar.register
class DifferentialTransformationChecker(TransformationChecker):
    """Converged when the mean |Δrot| and |Δtrans| over a sliding window of
    ``smoothLength`` steps fall below thresholds; NaN means divergence
    (reference: TransformationCheckersImpl.cpp:85-158).

    State is a fixed ring of the last smoothLength+1 rotations/translations
    (the reference keeps unbounded vectors but only reads the window)."""

    PARAMS = (
        Param("minDiffRotErr", "threshold for the mean windowed rotation "
              "delta [rad]", float, 0.001, min=0.0, max=6.2831854),
        Param("minDiffTransErr", "threshold for the mean windowed translation "
              "delta", float, 0.001, min=0.0),
        Param("smoothLength", "number of iterations in the smoothing window",
              int, 3, min=0, max=80),
    )
    limit_names = ("Min differential rotation err", "Min differential translation err")
    condition_names = ("Mean abs differential rot err", "Mean abs differential trans err")

    def init_state(self, T0):
        d = T0.shape[0] - 1
        w = max(int(self.smoothLength), 1)
        R_hist = jnp.broadcast_to(T0[:d, :d], (w + 1, d, d))
        t_hist = jnp.broadcast_to(T0[:d, d], (w + 1, d))
        return (R_hist, t_hist, jnp.int32(1))  # init() pushes T0

    def check(self, state, T, iteration):
        R_hist, t_hist, length = state
        d = T.shape[0] - 1
        w = R_hist.shape[0] - 1
        R_hist = jnp.concatenate([R_hist[1:], T[None, :d, :d]], axis=0)
        t_hist = jnp.concatenate([t_hist[1:], T[None, :d, d]], axis=0)
        length = length + 1

        # Mean consecutive deltas over the window; entries older than the
        # number of pushes are identical copies of the oldest real entry
        # (init broadcast), so they contribute zero — but the reference only
        # *evaluates* the stop rule once the history is longer than the
        # window, which we reproduce with the `ready` gate.
        ang = jnp.stack(
            [
                se3.rotation_angle_between(R_hist[i + 1], R_hist[i])
                for i in range(w)
            ]
        )
        tr = jnp.stack(
            [jnp.linalg.norm(t_hist[i + 1] - t_hist[i]) for i in range(w)]
        )
        mean_rot = jnp.sum(ang) / w
        mean_trans = jnp.sum(tr) / w
        ready = length > w
        converged = jnp.logical_and(
            mean_rot < self.minDiffRotErr, mean_trans < self.minDiffTransErr
        )
        stop_ok = jnp.logical_and(ready, converged)
        isnan = jnp.logical_or(jnp.isnan(mean_rot), jnp.isnan(mean_trans))
        stop = jnp.logical_or(stop_ok, isnan)
        code = jnp.where(isnan, CODE_NAN_ERROR, 0).astype(jnp.int32)
        return (R_hist, t_hist, length), stop, code


@TransformationCheckerRegistrar.register
class BoundTransformationChecker(TransformationChecker):
    """Diverged (ConvergenceError) when the transform drifts too far from its
    initial value (reference: TransformationCheckersImpl.cpp:167-225)."""

    PARAMS = (
        Param("maxRotationNorm", "maximum angle from the initial rotation "
              "[rad]", float, 1.0, min=0.0),
        Param("maxTranslationNorm", "maximum distance from the initial "
              "translation", float, 1.0, min=0.0),
    )
    limit_names = ("Max rotation angle", "Max translation norm")
    condition_names = ("Rotation angle", "Translation norm")

    def init_state(self, T0):
        d = T0.shape[0] - 1
        return (T0[:d, :d], T0[:d, d])

    def check(self, state, T, iteration):
        R0, t0 = state
        d = T.shape[0] - 1
        ang = se3.rotation_angle_between(T[:d, :d], R0)
        dist = jnp.linalg.norm(T[:d, d] - t0)
        out = jnp.logical_or(ang > self.maxRotationNorm, dist > self.maxTranslationNorm)
        code = jnp.where(out, CODE_BOUND_ERROR, 0).astype(jnp.int32)
        return state, out, code
