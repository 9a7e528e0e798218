"""Coloring validity tests (mirrors core/tests/valid_coloring.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.coloring import color_matrix, is_valid_coloring

A = amgx.gallery.poisson5pt(10, 10)
PROPER = ["MIN_MAX", "MIN_MAX_2RING", "GREEDY_MIN_MAX_2RING",
          "PARALLEL_GREEDY", "SERIAL_GREEDY_BFS", "GREEDY_RECOLOR",
          "MULTI_HASH", "LOCALLY_DOWNWIND"]


@pytest.mark.parametrize("scheme", PROPER)
def test_valid_coloring(scheme):
    c = color_matrix(A, scheme)
    assert is_valid_coloring(A, c)
    assert c.num_colors >= 2
    assert c.colors.min() >= 0


@pytest.mark.parametrize("scheme", ["PARALLEL_GREEDY", "SERIAL_GREEDY_BFS",
                                    "GREEDY_RECOLOR"])
def test_greedy_color_count_reasonable(scheme):
    # 5-pt stencil is 2-colorable; greedy should stay small
    c = color_matrix(A, scheme)
    assert c.num_colors <= 6


def test_two_ring_coloring_valid_at_distance_2():
    c = color_matrix(A, "MIN_MAX_2RING")
    assert is_valid_coloring(A, c, level=2)


def test_round_robin_uniform_exist():
    for scheme in ("ROUND_ROBIN", "UNIFORM"):
        c = color_matrix(A, scheme)
        assert c.colors.shape[0] == A.n_rows


def test_coloring_deterministic():
    c1 = color_matrix(A, "PARALLEL_GREEDY")
    c2 = color_matrix(A, "PARALLEL_GREEDY")
    assert np.array_equal(c1.colors, c2.colors)


def test_coloring_level_zero():
    cfg = amgx.AMGConfig("coloring_level=0")
    c = color_matrix(A, "PARALLEL_GREEDY", cfg)
    assert c.num_colors == 1
