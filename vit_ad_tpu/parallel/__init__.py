"""Device-mesh parallelism: mesh construction, sharding rules, sharded steps."""

from vit_ad_tpu.parallel.mesh import create_mesh  # noqa: F401
