from .files import discover_batch_dates, archive_batch_files  # noqa: F401
from .ingest import read_semicolon_csv, read_excel_sheet  # noqa: F401
from .warehouse import Warehouse, atomic_overwrite  # noqa: F401
from .testdata import load_tables  # noqa: F401
