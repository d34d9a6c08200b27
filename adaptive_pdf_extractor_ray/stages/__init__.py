"""map_batches stages. Stateless functions for pure transforms; callable
classes (actor pools) for stages that compile rules / hold broadcast state."""
