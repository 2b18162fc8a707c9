from .poisson import run_config, MeshFamily, make_mesh_family
