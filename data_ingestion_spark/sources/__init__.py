"""File-format sources replicating the reference's parsers
(reference: src/infrastructure/parsers/), each rebuilt on Spark's native
readers where one exists and on Arrow-batched UDFs where it doesn't.

All parsers follow the reference's output contract: every value is emitted as
a STRING column (src/infrastructure/parsers/csv_parser.rs:55,
excel_parser.rs:33, xml_parser.rs:30,42) — except JSON, which preserves
native types (json_parser.rs:6-23), and TXT's integer line_number
(txt_parser.rs:19-23).
"""

from .dispatch import extract_file_type, parse_file
from .csv_source import read_csv
from .json_source import read_json
from .txt_source import read_txt
from .xml_source import read_xml
from .excel_source import read_excel

__all__ = [
    "extract_file_type",
    "parse_file",
    "read_csv",
    "read_json",
    "read_txt",
    "read_xml",
    "read_excel",
]
