"""Graph adjacency parity vs the reference scipy implementation, over
every graph_type x refine_type combination."""

import numpy as np
import pytest

from manipose_tpu.data.graph_utils import adj_mx_from_skeleton
from manipose_tpu.geometry import h36m_skeleton_17

from conftest import install_reference_stubs, load_ref_module
from test_geometry import _reference_h36m_17

install_reference_stubs()
ref_graph = load_ref_module("mh_so3_hpe.data.graph_utils")

GRAPH_TYPES = [
    "default", "double_chain", "terminal_cycle", "centralized", "paired",
]
REFINE_TYPES = ["default", "self_weakening", "self_reinforcement"]


@pytest.mark.parametrize("graph_type", GRAPH_TYPES)
@pytest.mark.parametrize("refine_type", REFINE_TYPES)
def test_adjacency_matches_reference(graph_type, refine_type):
    ours = adj_mx_from_skeleton(
        h36m_skeleton_17(), graph_type=graph_type, refine_type=refine_type
    )
    ref = ref_graph.adj_mx_from_skeleton(
        _reference_h36m_17(), graph_type, refine_type
    ).numpy()
    assert ours.shape == ref.shape == (17, 17)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # rows of the normalized adjacency sum to 1 (row normalization)
    np.testing.assert_allclose(ours.sum(axis=1), 1.0, atol=1e-6)


def test_invalid_types_raise():
    with pytest.raises(ValueError, match="graph kernel"):
        adj_mx_from_skeleton(h36m_skeleton_17(), graph_type="nope")
    with pytest.raises(ValueError, match="refinement"):
        adj_mx_from_skeleton(h36m_skeleton_17(), refine_type="nope")
