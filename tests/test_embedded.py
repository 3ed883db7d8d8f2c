"""Embedded-interface partitioning (reference
EmbeddedMeshPartitionerDemo.cpp): agglomerates never cross the material
interface; coarse attributes inherited; de Rham invariants hold on the
material-aligned coarse spaces."""

import numpy as np

from parelag_tpu.models.embedded import embedded_demo, embedded_ball_mesh


def test_embedded_partition_respects_interface():
    topo, coarse, seq, ae_attr = embedded_demo(n=4, nref=1, n_parts=16)
    # every agglomerate is single-material
    assert all(len(a) == 1 for a in ae_attr)
    # both materials represented
    flat = np.array([a[0] for a in ae_attr])
    assert set(np.unique(flat)) == {1, 2}
    # coarse element attributes are well-defined (single-material AEs)
    assert set(np.unique(coarse.element_attribute)) == {1, 2}
    # coarsening on the material-aligned topology keeps the invariants
    errs, bad = seq.check_invariants(tol=1e-8)
    assert not bad, (bad, errs)


def test_embedded_ball_mesh_attrs():
    m = embedded_ball_mesh(n=4, nref=1)
    c = m.vertices[m.elements].mean(axis=1)
    r = np.linalg.norm(c, axis=1)
    assert ((m.attrib == 1) == (r <= 1.0)).all()
