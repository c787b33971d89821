from . import avro_codec, kafka
from .bucketed import bucketed_table, write_bucketed
from .catalog import TABLES, load_table, register_views

__all__ = ["TABLES", "avro_codec", "kafka", "load_table", "register_views"]
