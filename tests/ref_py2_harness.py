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


class _FakeNamespace(object):
    def __init__(self, base):
        self.base = base

    def __add__(self, other):
        return self.base + other


class _FakeXSD(object):
    float = "float"
    int = "int"
    string = "string"


class _FakeRdflibNamespaceMod(object):
    XSD = _FakeXSD


class _FakeRdflib(object):
    """Just enough of rdflib for Mapper: Namespace concat, URIRef/Literal
    tagging (we only need to observe KIND + lexical value), XSD names."""

    __name__ = "rdflib"
    Namespace = _FakeNamespace
    namespace = _FakeRdflibNamespaceMod

    @staticmethod
    def URIRef(v):
        return ("uri", v)

    @staticmethod
    def Literal(v, datatype=None):
        return ("literal", v, datatype)


class _Graph(object):
    def __init__(self):
        self.triples = []

    def add(self, triple):
        self.triples.append(triple)


class _MapperUtils(_Utils):
    """Fake Utilities for Mapper mode: real MapperTools, scenario-driven
    dictionary + existence oracle, reference-faithful counters."""

    def __init__(self, dictionary, existing):
        _Utils.__init__(self)
        self.dictionary = dictionary
        self._existing = set(existing)
        self.triples_row = 0
        self.mapped_cells = 0
        self.no_mapping_rule_errors_section = 0
        self.no_mapping_rule_errors_headers = 0
        self.mapper = MapperTools.MapperTools(self)

    def delete_accented_characters(self, text):
        # Utilities.py:451-464 behavior
        import unicodedata
        try:
            text = unicode(text, "utf-8")  # noqa: F821
            return unicodedata.normalize("NFD", text).encode("ascii", "ignore")
        except TypeError:
            return text

    def ask_if_resource_exists(self, uri):
        tail = uri.rsplit("/", 1)[-1]
        return tail in self._existing


def _term_to_json(t):
    if isinstance(t, tuple):
        if t[0] == "uri":
            return {"kind": "uri", "value": t[1]}
        return {"kind": "literal", "value": t[1], "datatype": t[2]}
    return {"kind": "plain", "value": t}


def run_mapper(scenario):
    """Drive the REAL Mapper.map() (rule cascade, typing, counters) with
    rdflib faked and the dictionary / existence oracle from the scenario."""
    sys.modules["rdflib"] = _FakeRdflib
    sys.modules.pop("Mapper", None)  # drop the _FakeModule stub
    import Mapper as MapperModule

    MapperModule.APPLY_FILTER_TO_TABLE_DATA = bool(
        scenario.get("apply_filter", False)
    )
    # the reference caches probe hits in a module global; isolate per run
    MapperModule.resources_found = []

    utils = _MapperUtils(
        scenario.get("dictionary", {}), scenario.get("existing", [])
    )
    graph = _Graph()
    # JSON gives unicode; the reference's own flow hands Mapper py2 str for
    # ascii-range content — normalize so str concat never mixes types
    table_data = []
    for row in scenario["table_data"]:
        table_data.append(
            dict(
                (k.encode("utf-8"), [v.encode("utf-8") for v in vals])
                for k, vals in row.items()
            )
        )
    m = MapperModule.Mapper(
        scenario.get("chapter", "en").encode("utf-8"),
        graph,
        scenario.get("topic", "topic").encode("utf-8"),
        scenario.get("resource", "Test_Resource").encode("utf-8"),
        table_data,
        utils,
        scenario.get("index", 1),
        table_section=scenario.get("section", "Sec").encode("utf-8"),
    )
    m.map()
    return {
        "triples": [
            [_term_to_json(s), _term_to_json(p), _term_to_json(o)]
            for (s, p, o) in graph.triples
        ],
        "triples_row": utils.triples_row,
        "mapped_cells": utils.mapped_cells,
        "errors_section": utils.no_mapping_rule_errors_section,
        "errors_headers": utils.no_mapping_rule_errors_headers,
        "reification_index": m.reification_index,
    }


def run_typing(scenario):
    """Real MapperTools.is_float/is_int + extract_value_from_cell over a
    value zoo — the F10 grammar, straight from the reference."""
    utils = _MapperUtils({}, [])
    mt = utils.mapper
    out = []
    for v in scenario["values"]:
        vv = v.encode("utf-8")
        out.append({
            "value": v,
            "is_float": bool(mt.is_float(vv)),
            "is_int": bool(mt.is_int(vv)),
        })
    cells = [
        {"cell": c, "value": mt.extract_value_from_cell(c)}
        for c in scenario.get("cells", [])
    ]
    return {"typing": out, "cells": cells}


def main():
    scenario = json.load(sys.stdin)
    # the reference print()s progress lines; keep stdout clean for our JSON
    real_stdout = sys.stdout
    sys.stdout = StringIO.StringIO()
    try:
        mode = scenario.get("mode", "parser")
        if mode == "mapper":
            result = run_mapper(scenario)
        elif mode == "typing":
            result = run_typing(scenario)
        else:
            result = run(scenario)
    finally:
        sys.stdout = real_stdout
    json.dump(result, sys.stdout)


if __name__ == "__main__":
    main()
