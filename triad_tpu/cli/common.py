"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import os


def add_platform_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--platform",
        choices=("cpu", "tpu", "axon", "cuda"),
        default=os.environ.get("TRIAD_PLATFORM"),
        help="force the JAX backend (default: JAX's own selection). "
        "Unlike the JAX_PLATFORMS env var this wins even when a "
        "site-registered plugin pins another platform, as long as no "
        "backend has initialized yet. Also settable via TRIAD_PLATFORM.",
    )


def apply_platform(args: argparse.Namespace) -> None:
    """Call BEFORE anything touches a JAX backend."""
    platform = getattr(args, "platform", None)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
