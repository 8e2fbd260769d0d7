from .catalog import QueryDef, catalog, register

__all__ = ["QueryDef", "catalog", "register"]
