from cdc.table.table import CdcTable  # noqa: F401
