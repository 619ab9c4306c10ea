from .files import TPCH_TABLES, ALL_TABLES, load_table, load_tables, parse_json_events

__all__ = ["TPCH_TABLES", "ALL_TABLES", "load_table", "load_tables", "parse_json_events"]
