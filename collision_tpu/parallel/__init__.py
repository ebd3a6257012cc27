from .sharded import collide_sharded, make_sharded_collider

__all__ = ["collide_sharded", "make_sharded_collider"]
