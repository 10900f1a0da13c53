"""Level-set functions (replaces circle_level_set / line_level_set,
apps/cuthho/cuthho_square.cpp:56-124).

A level set here is any callable pts [..., 2] -> phi [...]. Normals come
from ``jax.grad`` automatically (the reference hand-codes gradients); the
canonical shapes still provide analytic gradients for exactness.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LevelSet:
    """phi(pts) with gradient/normal evaluation.

    fn: pts [..., 2] -> [...]
    grad_fn: optional analytic gradient pts [..., 2] -> [..., 2];
             defaults to autodiff.
    """

    fn: Callable
    grad_fn: Optional[Callable] = None

    def __call__(self, pts):
        return self.fn(pts)

    def gradient(self, pts):
        if self.grad_fn is not None:
            return self.grad_fn(pts)
        flat = pts.reshape(-1, 2)
        g = jax.vmap(jax.grad(lambda p: self.fn(p)))(flat)
        return g.reshape(pts.shape)

    def normal(self, pts):
        """Unit outward (negative -> positive) normal, grad/|grad|
        (cuthho_square.cpp:81-88)."""
        g = self.gradient(pts)
        return g / jnp.linalg.norm(g, axis=-1, keepdims=True)


def circle_level_set(radius: float, alpha: float, beta: float) -> LevelSet:
    """(x-a)^2 + (y-b)^2 - r^2 (cuthho_square.cpp:56-89): negative inside."""

    def fn(pts):
        x = pts[..., 0] - alpha
        y = pts[..., 1] - beta
        return x * x + y * y - radius * radius

    def grad_fn(pts):
        return 2.0 * (pts - jnp.asarray([alpha, beta], dtype=pts.dtype))

    return LevelSet(fn, grad_fn)


def line_level_set(cut_y: float) -> LevelSet:
    """y - cut_y (cuthho_square.cpp:91-124): negative below the line."""

    def fn(pts):
        return pts[..., 1] - cut_y

    def grad_fn(pts):
        g = jnp.zeros_like(pts)
        return g.at[..., 1].set(1.0)

    return LevelSet(fn, grad_fn)


def ellipse_level_set(a: float, b: float, alpha: float,
                      beta: float) -> LevelSet:
    """((x-alpha)/a)^2 + ((y-beta)/b)^2 - 1: negative inside. Works with
    traced parameters (geometry families, cut/batched.py)."""

    def fn(pts):
        x = (pts[..., 0] - alpha) / a
        y = (pts[..., 1] - beta) / b
        return x * x + y * y - 1.0

    def grad_fn(pts):
        return jnp.stack([2.0 * (pts[..., 0] - alpha) / (a * a),
                          2.0 * (pts[..., 1] - beta) / (b * b)], axis=-1)

    return LevelSet(fn, grad_fn)


def flower_level_set(r0: float, amp: float, k: int, alpha: float,
                     beta: float) -> LevelSet:
    """r - (r0 + amp cos(k theta)): a k-petaled flower, negative inside
    (a smooth non-convex family exercising general cut geometry)."""

    def fn(pts):
        x = pts[..., 0] - alpha
        y = pts[..., 1] - beta
        r = jnp.sqrt(x * x + y * y)
        th = jnp.arctan2(y, x)
        return r - (r0 + amp * jnp.cos(k * th))

    return LevelSet(fn)
