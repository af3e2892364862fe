# coding=utf-8
"""Differential-test harness: runs the ACTUAL reference parser code (python 2.7)
on a JSON-described fake DOM and prints its refined output as JSON.

Usage:  python2.7 ref_py2_harness.py < scenario.json > result.json

scenario.json: {"table": <dom>, "section": "..."} where <dom> is
{"tag": str, "attrib": {..}, "children": [<dom-or-string>, ...]}.

The reference imports lxml/Mapper at module top; we stub those (the methods we
exercise — find_headers, refine_headers, extract_data, refine_data, and
MapperTools.filter_table_data — never touch them).  This file executes only the
reference's own logic; it is test tooling, not part of the engine.
"""
import json
import sys
import StringIO

REF = "/root/reference/table_extractor"


class _FakeModule(object):
    def __init__(self, name):
        self.__name__ = name

    def __getattr__(self, item):
        return _FakeModule(self.__name__ + "." + item)


# stub lxml + Mapper before importing the reference parser
sys.modules["lxml"] = _FakeModule("lxml")
sys.modules["lxml.html"] = _FakeModule("lxml.html")
sys.modules["Mapper"] = _FakeModule("Mapper")
sys.path.insert(0, REF)

import HtmlTableParser  # noqa: E402
import MapperTools  # noqa: E402


class FakeElement(object):
    """Just enough of lxml's element API for the reference parser."""

    def __init__(self, spec):
        self.tag = spec["tag"]
        self.attrib = dict(spec.get("attrib", {}))
        self.children = [
            c if isinstance(c, basestring) else FakeElement(c)  # noqa: F821
            for c in spec.get("children", [])
        ]

    @property
    def text(self):
        if self.children and isinstance(self.children[0], basestring):  # noqa: F821
            return self.children[0]
        return None

    def findall(self, tag):
        return [c for c in self.children if isinstance(c, FakeElement) and c.tag == tag]

    def iterchildren(self):
        for c in self.children:
            if isinstance(c, FakeElement):
                yield c

    def itertext(self):
        for c in self.children:
            if isinstance(c, basestring):  # noqa: F821
                yield c
            else:
                for t in c.itertext():
                    yield t

    def __iter__(self):
        return self.iterchildren()

    def __len__(self):
        return sum(1 for c in self.children if isinstance(c, FakeElement))


class _Log(object):
    def info(self, *a, **k):
        pass

    debug = warning = warn = info


class _Utils(object):
    def __init__(self):
        self.logging = _Log()
        self.chapter = "en"
        self.output_format = "1"
        self.data_extracted_to_map = 0


def run(scenario):
    table = FakeElement(scenario["table"])
    utils = _Utils()
    import types

    # HtmlTableParser is an old-style class under py2: bypass __init__ with
    # InstanceType so we can drive individual methods without lxml/network.
    parser = types.InstanceType(HtmlTableParser.HtmlTableParser)
    parser.utils = utils
    parser.logging = utils.logging
    parser.resource = scenario.get("resource", "Test_Resource")
    parser.headers_not_resolved = 0
    parser.current_html_table = table

    import Table

    tab = Table.Table()
    tab.n_rows = parser.count_rows()
    parser.find_headers(tab)
    result = {"headers_found": bool(tab.headers), "vertical": tab.vertical_table}
    if tab.headers:
        parser.refine_headers(tab)
        parser.extract_data(tab)
        parser.refine_data(tab)
    result["headers_refined"] = [h["th"] for h in tab.headers_refined]
    result["headers_not_resolved"] = parser.headers_not_resolved

    data_refined = tab.data_refined
    if scenario.get("apply_summary_filter", True) and data_refined:
        mt = MapperTools.MapperTools(utils)
        data_refined = mt.filter_table_data(data_refined, scenario.get("section", ""))
    rows = []
    for row in data_refined:
        rows.append(sorted([[k, list(v)] for k, v in row.items()]))
    result["data_refined"] = rows
    result["to_map_delta"] = utils.data_extracted_to_map
    return result


def main():
    scenario = json.load(sys.stdin)
    # the reference print()s progress lines; keep stdout clean for our JSON
    real_stdout = sys.stdout
    sys.stdout = StringIO.StringIO()
    try:
        result = run(scenario)
    finally:
        sys.stdout = real_stdout
    json.dump(result, sys.stdout)


if __name__ == "__main__":
    main()
