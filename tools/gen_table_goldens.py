"""Generate expected LaTeX tabular serializations by RUNNING the
reference's document.py (Spec/TableCell/TableRow/Tabular) and replaying
markdown.py's TableRow/Tabular assembly (markdown.py:134-163) verbatim.
"""
import importlib.util, sys, json

spec = importlib.util.spec_from_file_location(
    "refdoc", "/root/reference/nougat/dataset/parser/document.py")
refdoc = importlib.util.module_from_spec(spec)
sys.modules["refdoc"] = refdoc
spec.loader.exec_module(refdoc)

def mk_cell(text, classes=(), colspan=None, rowspan=None):
    c = refdoc.TableCell()
    attrs = {"class": list(classes)}
    if colspan: attrs["colspan"] = colspan
    if rowspan: attrs["rowspan"] = rowspan
    c.set_attrs(attrs)
    if text:
        t = refdoc.TextElement(content=text)
        t.parent = c
        c.children.append(t)
    return c

def mk_table(rows):
    tab = refdoc.Tabular()
    for r in rows:
        row = refdoc.TableRow()
        for c in r:
            row.add_cell(c)
        tab.add_row(row)
    return tab

def fmt_cell(cell):
    # markdown.py:133-144 TableCell branch (latex_env content = plain text here)
    parts = [ch.content for ch in cell.children]
    while parts and parts[-1].strip() == "":
        parts.pop()
    s = "".join(parts)
    if cell.multirow is not None:
        s = "\\multirow{%i}{*}{%s}" % (cell.multirow, s)
    if cell.multicolumn is not None:
        s = "\\multicolumn{%i}{%s}{%s}" % (cell.multicolumn, cell.spec, s)
    return s

def fmt_row(row):
    # markdown.py:145-156
    parts = []
    if row.hline_above:
        parts.append(row.hline_above + "\n")
    parts.append(" & ".join(fmt_cell(c) for c in row.cells))
    parts.append(" \\\\")
    parts.append((" " + row.hline_below).rstrip())
    return "".join(parts)

def fmt_tabular(tab):
    # markdown.py:157-163 — get_table_spec mutates (squares) first,
    # exactly like the reference call order
    spec_str = tab.get_table_spec()
    rows = "\n".join(fmt_row(r) for r in tab.rows)
    return "\\begin{tabular}{%s}\n%s\n\\end{tabular}" % (spec_str, rows)

cases = {}

# 1. fully bordered 2x3, centered
cases["full_grid"] = mk_table([
    [mk_cell("a1", ["ltx_align_center","ltx_border_t","ltx_border_b","ltx_border_l","ltx_border_r"]),
     mk_cell("a2", ["ltx_align_center","ltx_border_t","ltx_border_b","ltx_border_l","ltx_border_r"]),
     mk_cell("a3", ["ltx_align_center","ltx_border_t","ltx_border_b","ltx_border_l","ltx_border_r"])],
    [mk_cell("b1", ["ltx_align_center","ltx_border_b","ltx_border_l","ltx_border_r"]),
     mk_cell("b2", ["ltx_align_center","ltx_border_b","ltx_border_l","ltx_border_r"]),
     mk_cell("b3", ["ltx_align_center","ltx_border_b","ltx_border_l","ltx_border_r"])],
])

# 2. header underline only (border_b on row 1), left aligned data
cases["header_rule"] = mk_table([
    [mk_cell("h1", ["ltx_align_left","ltx_border_b"]),
     mk_cell("h2", ["ltx_align_left","ltx_border_b"])],
    [mk_cell("d1", ["ltx_align_left"]), mk_cell("d2", ["ltx_align_left"])],
])

# 3. partial cline: only middle column of row2 has border_t
cases["partial_cline"] = mk_table([
    [mk_cell("a", ["ltx_align_right"]), mk_cell("b", ["ltx_align_right"]), mk_cell("c", ["ltx_align_right"])],
    [mk_cell("d", ["ltx_align_right"]), mk_cell("e", ["ltx_align_right","ltx_border_t"]), mk_cell("f", ["ltx_align_right"])],
])

# 4. double rule: ltx_border_tt on every cell of row 1
cases["double_rule"] = mk_table([
    [mk_cell("x", ["ltx_align_center","ltx_border_tt"]), mk_cell("y", ["ltx_align_center","ltx_border_tt"])],
    [mk_cell("u", ["ltx_align_center"]), mk_cell("v", ["ltx_align_center"])],
])

# 5. multicolumn with borders + cline under the span only
cases["multicol_span"] = mk_table([
    [mk_cell("wide", ["ltx_align_center","ltx_border_b","ltx_border_l","ltx_border_r"], colspan=2),
     mk_cell("nar", ["ltx_align_left"])],
    [mk_cell("p", ["ltx_align_left"]), mk_cell("q", ["ltx_align_left"]), mk_cell("r", ["ltx_align_left"])],
])

# 6. multirow: t/b disabling + placeholder insertion
cases["multirow_block"] = mk_table([
    [mk_cell("span", ["ltx_align_left","ltx_border_t","ltx_border_b"], rowspan=2),
     mk_cell("r1", ["ltx_align_left","ltx_border_t"])],
    [mk_cell("r2", ["ltx_align_left","ltx_border_b"])],
])

# 7. mismatched cell spec -> multicolumn{1} conversion (align differs from column majority)
cases["spec_mismatch"] = mk_table([
    [mk_cell("n1", ["ltx_align_left","ltx_border_l"]), mk_cell("n2", ["ltx_align_left"])],
    [mk_cell("n3", ["ltx_align_left","ltx_border_l"]), mk_cell("odd", ["ltx_align_right"])],
    [mk_cell("n5", ["ltx_align_left","ltx_border_l"]), mk_cell("n6", ["ltx_align_left"])],
])

# 8. no aligns at all, only borders (spec defaults to centered)
cases["borders_no_align"] = mk_table([
    [mk_cell("m1", ["ltx_border_t"]), mk_cell("m2", ["ltx_border_t"])],
    [mk_cell("m3", []), mk_cell("m4", [])],
])

out = {k: fmt_tabular(t) for k, t in cases.items()}
print(json.dumps(out, indent=1))
