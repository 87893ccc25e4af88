"""Test configuration: force JAX onto an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware, and so tests never grab the
single-client TPU tunnel. The axon sitecustomize registers the TPU plugin at
interpreter start, so we override the platform via jax.config before any
backend is initialized (env vars alone are overridden by the plugin)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def karate():
    from embiggen_tpu.graph import karate_club

    return karate_club()


@pytest.fixture(scope="session")
def ppi():
    from embiggen_tpu.graph import small_ppi

    return small_ppi()


@pytest.fixture(scope="session")
def er_graph():
    from embiggen_tpu.graph import erdos_renyi

    return erdos_renyi(200, 800, seed=7, weighted=True, n_edge_types=3, n_node_types=4)
