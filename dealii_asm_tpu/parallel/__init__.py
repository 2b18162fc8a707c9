from .sharding import make_mesh, shard_cells, shard_dofs, sharded_solver_step
