"""Dated-file batch discovery and archival (reference main.py:8-33).

These are deliberately driver-side: batch discovery is orchestration,
not data processing. The distributed analog (regexp_extract over
input_file_name()) is available in streaming.filestream for the
Structured-Streaming ingest path.
"""

from __future__ import annotations

import os
import re
import shutil

#: 8-digit DDMMYYYY batch stamp embedded in input filenames
#: (reference main.py:9).
DATE_PATTERN = re.compile(r"(\d{8})")


def discover_batch_dates(directory: str) -> list[str]:
    """Unique 8-digit date stamps found in filenames, sorted ascending
    (reference main.py:8-17,33). Sorting is lexicographic, matching the
    reference's `sorted(...)` on DDMMYYYY strings (a documented quirk:
    '01022024' sorts before '02012024')."""
    dates = set()
    for filename in os.listdir(directory):
        m = DATE_PATTERN.search(filename)
        if m:
            dates.add(m.group(1))
    return sorted(dates)


def archive_batch_files(directory: str, date: str, archive_subdir: str = "archive") -> list[str]:
    """Move every file carrying `date` in its name to
    `<dir>/archive/<name>.backup` (reference main.py:20-30). Returns the
    new paths. Creates the archive dir if absent (the reference assumes
    it exists)."""
    archive_dir = os.path.join(directory, archive_subdir)
    os.makedirs(archive_dir, exist_ok=True)
    moved = []
    for filename in os.listdir(directory):
        m = DATE_PATTERN.search(filename)
        if m and m.group(1) == date:
            src = os.path.join(directory, filename)
            if not os.path.isfile(src):
                continue
            dst = os.path.join(archive_dir, filename + ".backup")
            shutil.move(src, dst)
            moved.append(dst)
    return moved
