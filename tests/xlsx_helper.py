"""Compat shim — the stdlib xlsx writer now lives in the package so
driver-gated queries can build workbook fixtures too."""

from data_ingestion_spark.sources.xlsx_writer import make_xlsx  # noqa: F401
