"""Domain modules of the query/oracle registry (split r11 from the
single-file plans/registry.py). Each module holds one domain's
builders, its shared oracle CTE fragments, and its ORACLE_SQL dict;
plans.registry assembles and re-exports the full surface.
"""
