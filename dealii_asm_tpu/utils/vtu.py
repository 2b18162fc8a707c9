"""Minimal VTU (unstructured-grid XML) writer for lattice solutions.

Plays the role of the reference's DataOut VTU dumps
(/root/reference/element_centered_preconditioners_01.cc:760-777,
mesh_types_*.cc): nodes are the FE lattice points, cells are the p^dim linear
sub-cells of each element (equivalent to deal.II's build_patches(degree))."""

from __future__ import annotations

import numpy as np


def write_vtu(path: str, dofs, point_data: dict):
    """Write an ASCII .vtu with the DoF lattice and named nodal fields."""
    pts = dofs.points  # (n, dim)
    dim = dofs.mesh.dim
    n = pts.shape[0]
    pts3 = np.zeros((n, 3))
    pts3[:, :dim] = pts

    # connectivity: linear sub-cells between adjacent lattice nodes
    N = dofs.nodes_per_dim
    strides = np.cumprod([1] + list(N[:-1]))

    def node(idx):  # idx: (dim,) multi-index with periodic wrap
        return sum((idx[d] % N[d]) * strides[d] for d in range(dim))

    cells = []
    ranges = [range(N[d] if dofs.mesh.periodic[d] else N[d] - 1)
              for d in range(dim)]
    if dim == 2:
        for j in ranges[1]:
            for i in ranges[0]:
                cells.append([node((i, j)), node((i + 1, j)),
                              node((i + 1, j + 1)), node((i, j + 1))])
        ctype, npts = 9, 4  # VTK_QUAD
    else:
        for k in ranges[2]:
            for j in ranges[1]:
                for i in ranges[0]:
                    cells.append([
                        node((i, j, k)), node((i + 1, j, k)),
                        node((i + 1, j + 1, k)), node((i, j + 1, k)),
                        node((i, j, k + 1)), node((i + 1, j, k + 1)),
                        node((i + 1, j + 1, k + 1)), node((i, j + 1, k + 1))])
        ctype, npts = 12, 8  # VTK_HEXAHEDRON

    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{n}" NumberOfCells="{len(cells)}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts3, fmt="%.10g")
        f.write("</DataArray></Points>\n<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="ascii">\n')
        np.savetxt(f, np.asarray(cells, dtype=np.int64), fmt="%d")
        f.write('</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        np.savetxt(f, np.arange(1, len(cells) + 1) * npts, fmt="%d")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        np.savetxt(f, np.full(len(cells), ctype, dtype=np.uint8), fmt="%d")
        f.write("</DataArray>\n</Cells>\n<PointData>\n")
        for name, data in point_data.items():
            f.write(f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
            np.savetxt(f, np.asarray(data).reshape(-1, 1), fmt="%.10g")
            f.write("</DataArray>\n")
        f.write("</PointData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")


def write_vtu_mesh(path: str, mesh, cell_data: dict | None = None):
    """Write a mesh (StructuredMesh or UnstructuredMesh) as a .vtu of its
    cells — the mesh-gallery output of the reference's mesh_types_*.cc."""
    from ..mesh.unstructured import UnstructuredMesh, _VERTEX_COORDS

    if not isinstance(mesh, UnstructuredMesh):
        from ..mesh.grid import create_mesh_from_cells

        mesh = create_mesh_from_cells(mesh, np.arange(mesh.n_cells_total))
    dim = mesh.dim
    pts3 = np.zeros((mesh.n_vertices, 3))
    pts3[:, :dim] = mesh.vertices
    # lexicographic -> VTK vertex order
    perm = [0, 1, 3, 2] if dim == 2 else [0, 1, 3, 2, 4, 5, 7, 6]
    cells = mesh.cells[:, perm]
    ctype, npts = (9, 4) if dim == 2 else (12, 8)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n')
        f.write(f'<Piece NumberOfPoints="{mesh.n_vertices}" '
                f'NumberOfCells="{len(cells)}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts3, fmt="%.10g")
        f.write("</DataArray></Points>\n<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="ascii">\n')
        np.savetxt(f, np.asarray(cells, dtype=np.int64), fmt="%d")
        f.write('</DataArray>\n<DataArray type="Int64" Name="offsets" '
                'format="ascii">\n')
        np.savetxt(f, np.arange(1, len(cells) + 1) * npts, fmt="%d")
        f.write('</DataArray>\n<DataArray type="UInt8" Name="types" '
                'format="ascii">\n')
        np.savetxt(f, np.full(len(cells), ctype, dtype=np.uint8), fmt="%d")
        f.write("</DataArray>\n</Cells>\n<CellData>\n")
        for name, data in (cell_data or {}).items():
            f.write(f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
            np.savetxt(f, np.asarray(data).reshape(-1, 1), fmt="%.10g")
            f.write("</DataArray>\n")
        f.write("</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")
