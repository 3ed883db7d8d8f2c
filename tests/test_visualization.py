"""Coloring + VTK export (reference: structures/Coloring.hpp,
topology/Visualization.cpp — GLVis/VisIt replaced by portable VTK files)."""

import numpy as np

from parelag_tpu.mesh.mesh import hex_grid_mesh
from parelag_tpu.topology.topology import AgglomeratedTopology
from parelag_tpu.topology.coloring import get_element_coloring
from parelag_tpu.partitioning.partitioners import refined_mesh_partition
from parelag_tpu.mesh.vtk import write_vtk, save_agglomerates_vtk


def test_coloring_is_proper():
    m = hex_grid_mesh(4, 4, 4)
    topo = AgglomeratedTopology.from_mesh(m)
    G = topo.local_element_element().tocsr()
    colors = get_element_coloring(G)
    assert colors.min() >= 0
    coo = G.tocoo()
    off = coo.row != coo.col
    assert (colors[coo.row[off]] != colors[coo.col[off]]).all()
    # a structured hex grid is 2-colorable like a checkerboard; greedy BFS
    # stays small
    assert colors.max() <= 4


def test_vtk_roundtrip(tmp_path):
    m = hex_grid_mesh(2, 2, 2)
    p = tmp_path / "mesh.vtk"
    write_vtk(m, str(p),
              point_data={"u": np.arange(m.vertices.shape[0], dtype=float),
                          "v": np.ones((m.vertices.shape[0], 3))},
              cell_data={"attr": np.asarray(m.attrib, dtype=float)})
    text = p.read_text()
    assert "POINTS 27 double" in text
    assert "CELLS 8 72" in text
    assert "CELL_TYPES 8" in text and "\n12\n" in text
    assert "SCALARS u" in text and "VECTORS v" in text
    assert "SCALARS attr" in text


def test_agglomerate_vtk(tmp_path):
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    c1 = topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    p = tmp_path / "agg.vtk"
    save_agglomerates_vtk(topo, m, str(p))
    text = p.read_text()
    assert "SCALARS partitioning" in text and "SCALARS coloring" in text
    from parelag_tpu.mesh.vtk import agglomerate_cell_data
    d = agglomerate_cell_data(topo)
    assert d["partitioning"].size == 64
    assert set(np.unique(d["partitioning"])) == set(range(8))
    # neighbouring agglomerates got different colors
    assert np.unique(d["coloring"]).size >= 2


def test_basis_function_export(tmp_path):
    """HdivL2ExtensionVisualize analog: coarse basis functions exported as
    VTK fields for every form."""
    from parelag_tpu.mesh.vtk import save_basis_functions_vtk
    from parelag_tpu.amge.fespace import DeRhamSequenceFE
    from parelag_tpu.partitioning.partitioners import refined_mesh_partition
    m = hex_grid_mesh(2, 2, 2).uniform_refinement()
    topo = AgglomeratedTopology.from_mesh(m)
    topo.coarsen_local_partitioning(refined_mesh_partition(64, 8))
    seq = DeRhamSequenceFE(topo, m)
    seq.set_upscaling_targets(0)
    seq.coarsen()
    for j in range(4):
        fs = save_basis_functions_vtk(seq, j, [0], str(tmp_path / "b"))
        text = open(fs[0]).read()
        assert "basis" in text and "CELL_TYPES" in text
