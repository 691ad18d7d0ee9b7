"""Package install (parity: reference setup.py — `pip install -e .`)."""
from setuptools import find_packages, setup

setup(
    name="lcp_physics_tpu",
    version="0.1.0",
    description=("TPU-native differentiable 2D rigid-body physics engine "
                 "(JAX/XLA/Pallas rebuild of the capabilities of "
                 "locuslab/lcp-physics)"),
    packages=find_packages(include=["lcp_physics_tpu",
                                    "lcp_physics_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    extras_require={
        "demos": ["pygame", "optax", "matplotlib"],
        "test": ["pytest", "scipy"],
    },
)
