"""Pallas TPU kernels.

One kernel remains: the fused dense GAT round (fused_dense_gat.py). It is
parity-tested but OFF by default — measured slower than the XLA one-hot
path at production shapes (see the kernel header for the measurement and
crossover condition). Enable with GRAPHVQA_USE_PALLAS=1 for experiments.
"""


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


__all__ = ["pallas_available"]
