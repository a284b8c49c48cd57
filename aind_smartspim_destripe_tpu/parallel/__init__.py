"""Device-mesh parallelism: sharded destripe steps and collectives."""
