"""Excel reader coverage beyond the KNA fixtures: date/time styles,
formula cached values, booleans, multi-sheet selection (A2/A21)."""

import zipfile

import pytest

from dedupe_ray.sources import excel_sheet_names, read_excel_table

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_RNS = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'

_WORKBOOK = f"""<workbook {_NS} {_RNS}>
<sheets>
  <sheet name="Main" sheetId="1" r:id="rId1"/>
  <sheet name="Extra" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

_RELS = """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

# xf 0: General; xf 1: builtin 14 (m/d/yy); xf 2: builtin 21 (h:mm:ss);
# xf 3: custom date code; xf 4: custom elapsed-time code
_STYLES = f"""<styleSheet {_NS}>
<numFmts count="2">
  <numFmt numFmtId="164" formatCode="yyyy&quot;-&quot;mm&quot;-&quot;dd"/>
  <numFmt numFmtId="165" formatCode="[h]:mm:ss"/>
</numFmts>
<cellXfs count="5">
  <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="21"/>
  <xf numFmtId="164"/><xf numFmtId="165"/>
</cellXfs>
</styleSheet>"""

# serial 43845 = 2020-01-15; 0.572916666666667 d = 13:45:00;
# 44196.5 = 2020-12-31 12:00:00; formula cell carries its cached <v>
_SHEET1 = f"""<worksheet {_NS}><sheetData>
<row r="1">
  <c r="A1" t="inlineStr"><is><t>When</t></is></c>
  <c r="B1" t="inlineStr"><is><t>Clock</t></is></c>
  <c r="C1" t="inlineStr"><is><t>Total</t></is></c>
  <c r="D1" t="inlineStr"><is><t>Flag</t></is></c>
  <c r="E1" t="inlineStr"><is><t>Custom</t></is></c>
</row>
<row r="2">
  <c r="A2" s="1"><v>43845</v></c>
  <c r="B2" s="2"><v>0.572916666666667</v></c>
  <c r="C2"><f>SUM(1,2)</f><v>3</v></c>
  <c r="D2" t="b"><v>1</v></c>
  <c r="E2" s="3"><v>44196.5</v></c>
</row>
<row r="3">
  <c r="A3" s="4"><v>0.25</v></c>
  <c r="B3" t="b"><v>0</v></c>
  <c r="C3"><v>2.5</v></c>
  <c r="D3" t="e"><v>#DIV/0!</v></c>
  <c r="E3" s="1"><v>bogus</v></c>
</row>
</sheetData></worksheet>"""

_SHEET2 = f"""<worksheet {_NS}><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>Other</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>second sheet</t></is></c></row>
</sheetData></worksheet>"""


@pytest.fixture()
def workbook_path(tmp_path):
    p = tmp_path / "features.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_date_time_formula_boolean_cells(workbook_path):
    t = read_excel_table(workbook_path)
    row = {name: t.column(name)[0].as_py() for name in t.column_names}
    assert row["When"] == "2020-01-15 00:00:00"   # builtin date style
    assert row["Clock"] == "13:45:00"             # builtin time style
    assert row["Total"] == "3"                    # formula cached value
    assert row["Flag"] == "True"                  # boolean like pandas str()
    assert row["Custom"] == "2020-12-31 12:00:00"  # custom yyyy-mm-dd code
    row2 = {name: t.column(name)[1].as_py() for name in t.column_names}
    assert row2["When"] == "06:00:00"             # [h]:mm:ss elapsed time
    assert row2["Clock"] == "False"
    assert row2["Total"] == "2.5"                 # non-integral float kept
    assert row2["Flag"] == "#DIV/0!"              # error cell text
    assert row2["Custom"] == "bogus"              # non-numeric in date style


def test_multi_sheet_selection(workbook_path):
    assert excel_sheet_names(workbook_path) == ["Main", "Extra"]
    by_index = read_excel_table(workbook_path, sheet=1)
    by_name = read_excel_table(workbook_path, sheet="Extra")
    assert by_index.column("Other").to_pylist() == ["second sheet"]
    assert by_name.column("Other").to_pylist() == ["second sheet"]
    with pytest.raises(ValueError, match="no sheet named"):
        read_excel_table(workbook_path, sheet="Missing")
    with pytest.raises(ValueError, match="out of range"):
        read_excel_table(workbook_path, sheet=2)


def test_write_excel_roundtrip(tmp_path):
    import pyarrow as pa

    from dedupe_ray.sinks import write_excel_table
    from dedupe_ray.sources import read_excel_table, excel_sheet_names

    t = pa.table(
        {
            "Name 1": ["acme <&> gmbh", "bob's \"shop\"", ""],
            "City": ["kraków", "line\nbreak", "  spaced  "],
            "n": ["1", "2.5", ""],
        }
    )
    p = str(tmp_path / "out.xlsx")
    write_excel_table(t, p, sheet_name="Merged")
    assert excel_sheet_names(p) == ["Merged"]
    back = read_excel_table(p)
    for col in t.column_names:
        assert back.column(col).to_pylist() == t.column(col).to_pylist(), col
