"""Build minimal real .xlsx workbooks (OOXML zip) with stdlib only —
this container has no openpyxl, and the xlsx format is public ECMA-376."""

from __future__ import annotations

import zipfile


def _cell_ref(col: int, row: int) -> str:
    letters = ""
    col += 1
    while col:
        col, rem = divmod(col - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return f"{letters}{row + 1}"


def make_xlsx(path: str, sheets: list[list[list[object]]], shared: bool = False) -> str:
    """Write a workbook; each sheet is a list of rows of cell values.

    ``shared=True`` routes strings through sharedStrings.xml (how real
    writers store them); otherwise inline strings are used.
    """
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    strings: list[str] = []

    def cell_xml(c: int, r: int, val: object) -> str:
        ref = _cell_ref(c, r)
        if isinstance(val, (int, float)):
            return f'<c r="{ref}"><v>{val}</v></c>'
        s = str(val)
        if shared:
            if s not in strings:
                strings.append(s)
            return f'<c r="{ref}" t="s"><v>{strings.index(s)}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'

    sheet_xmls = []
    for sheet in sheets:
        rows_xml = "".join(
            f'<row r="{r + 1}">' + "".join(cell_xml(c, r, v) for c, v in enumerate(row)) + "</row>"
            for r, row in enumerate(sheet)
        )
        sheet_xmls.append(f'<worksheet {ns}><sheetData>{rows_xml}</sheetData></worksheet>')

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
        if shared and strings:
            items = "".join(f"<si><t>{s}</t></si>" for s in strings)
            zf.writestr(f"xl/sharedStrings.xml", f"<sst {ns}>{items}</sst>")
    return path
