from tagtree_spark.functions.hashing import h60, h60_seeded, duck_h60, label_hash

__all__ = ["h60", "h60_seeded", "duck_h60", "label_hash"]
