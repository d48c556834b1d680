"""RDF/XML-lite subset (rdf_spark.sources.rdfxml): documented subset
semantics, base/lang scoping, error contracts."""

import pytest

from rdf_spark.sources.rdfxml import RdfXmlError, parse_rdfxml
from rdf_spark.terms import RDF_TYPE

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
HDR = f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="http://ex/">'
BASE = "http://crawl.example/doc"


def trip(quads):
    return {(q[0], q[1][1], q[2]) for q in quads}


def test_typed_node_about_and_property_elements():
    got = trip(parse_rdfxml(HDR + """
        <ex:Person rdf:about="http://ex/a">
          <ex:name>Ada</ex:name>
          <ex:knows rdf:resource="http://ex/b"/>
        </ex:Person></rdf:RDF>"""))
    s = ("i", "http://ex/a")
    assert (s, RDF_TYPE, ("i", "http://ex/Person")) in got
    assert (s, "http://ex/name", ("l", "Ada", None, None)) in got
    assert (s, "http://ex/knows", ("i", "http://ex/b")) in got


def test_relative_about_and_id_resolve_against_base():
    got = trip(parse_rdfxml(HDR + """
        <rdf:Description rdf:about="rel"><ex:p>x</ex:p></rdf:Description>
        <rdf:Description rdf:ID="frag"><ex:p>y</ex:p></rdf:Description>
        </rdf:RDF>""", base=BASE))
    subs = {s for s, _, _ in got}
    assert ("i", "http://crawl.example/rel") in subs
    assert ("i", "http://crawl.example/doc#frag") in subs


def test_property_attributes_and_xml_lang_inheritance():
    got = trip(parse_rdfxml(HDR.replace(">", ' xml:lang="en">') + """
        <rdf:Description rdf:about="http://ex/a" ex:title="Hi">
          <ex:label>hello</ex:label>
          <ex:label xml:lang="fr">bonjour</ex:label>
        </rdf:Description></rdf:RDF>"""))
    s = ("i", "http://ex/a")
    assert (s, "http://ex/title", ("l", "Hi", None, "en")) in got
    assert (s, "http://ex/label", ("l", "hello", None, "en")) in got
    assert (s, "http://ex/label", ("l", "bonjour", None, "fr")) in got


def test_nested_node_nodeid_datatype_and_parsetype_resource():
    got = trip(parse_rdfxml(HDR + """
        <rdf:Description rdf:about="http://ex/a">
          <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#int"
            >36</ex:age>
          <ex:addr rdf:parseType="Resource">
            <ex:city>London</ex:city>
          </ex:addr>
          <ex:knows><ex:Person rdf:nodeID="b"/></ex:knows>
        </rdf:Description></rdf:RDF>"""))
    s = ("i", "http://ex/a")
    assert (s, "http://ex/age",
            ("l", "36", "http://www.w3.org/2001/XMLSchema#int",
             None)) in got
    assert (s, "http://ex/knows", ("b", "b")) in got
    city = [o for su, p, o in got if p == "http://ex/city"]
    assert city == [("l", "London", None, None)]
    # the parseType=Resource bnode links from the subject
    addr = [o for su, p, o in got if p == "http://ex/addr"]
    assert addr and addr[0][0] == "b"


def test_rdf_li_membership_counters():
    got = trip(parse_rdfxml(HDR + """
        <rdf:Bag rdf:about="http://ex/bag">
          <rdf:li>one</rdf:li><rdf:li>two</rdf:li>
        </rdf:Bag></rdf:RDF>"""))
    s = ("i", "http://ex/bag")
    assert (s, RDF + "_1", ("l", "one", None, None)) in got
    assert (s, RDF + "_2", ("l", "two", None, None)) in got


def test_out_of_subset_raises():
    for body in [
        '<rdf:Description rdf:about="http://ex/a">'
        '<ex:p rdf:parseType="Literal"><b>x</b></ex:p></rdf:Description>',
        '<rdf:Description rdf:about="http://ex/a">'
        '<ex:p rdf:ID="reify">x</ex:p></rdf:Description>',
        "<broken",
    ]:
        with pytest.raises((RdfXmlError, ValueError)):
            parse_rdfxml(HDR + body + "</rdf:RDF>")


def test_deterministic():
    doc = HDR + """
        <ex:Person rdf:about="http://ex/a"><ex:knows>
          <ex:Person><ex:name>N</ex:name></ex:Person>
        </ex:knows></ex:Person></rdf:RDF>"""
    assert parse_rdfxml(doc) == parse_rdfxml(doc)


def test_rdf_type_attribute_and_obsolete_attrs():
    got = trip(parse_rdfxml(
        HDR + '<rdf:Description rdf:about="http://ex/a" '
        'rdf:type="http://ex/C"/></rdf:RDF>'))
    assert (("i", "http://ex/a"), RDF_TYPE, ("i", "http://ex/C")) in got
    with pytest.raises(RdfXmlError):
        parse_rdfxml(HDR + '<rdf:Description rdf:about="http://ex/a" '
                     'rdf:bagID="b"/></rdf:RDF>')


def test_property_attrs_on_property_element_raise():
    with pytest.raises(RdfXmlError):
        parse_rdfxml(HDR + '<rdf:Description rdf:about="http://ex/a">'
                     '<ex:p ex:q="v"/></rdf:Description></rdf:RDF>')


def test_unqualified_and_xml_attrs_on_property_element_tolerated():
    got = trip(parse_rdfxml(
        HDR + '<rdf:Description rdf:about="http://ex/a">'
        '<ex:p class="x" xml:space="preserve">v</ex:p>'
        '</rdf:Description></rdf:RDF>'))
    assert (("i", "http://ex/a"), "http://ex/p",
            ("l", "v", None, None)) in got


def test_parsetype_collection():
    got = trip(parse_rdfxml(HDR + """
        <rdf:Description rdf:about="http://ex/a">
          <ex:items rdf:parseType="Collection">
            <rdf:Description rdf:about="http://ex/i1"/>
            <rdf:Description rdf:about="http://ex/i2"/>
          </ex:items>
          <ex:empty rdf:parseType="Collection"></ex:empty>
        </rdf:Description></rdf:RDF>"""))
    rest = RDF + "rest"
    items = {o for s, p, o in got if p == RDF + "first"}
    assert items == {("i", "http://ex/i1"), ("i", "http://ex/i2")}
    # chain: head cell from subject, tail terminates at rdf:nil
    heads = [o for s, p, o in got if p == "http://ex/items"]
    assert len(heads) == 1 and heads[0][0] == "b"
    assert (RDF + "nil") in {o[1] for s, p, o in got if p == rest}
    # empty collection -> rdf:nil directly
    assert (("i", "http://ex/a"), "http://ex/empty",
            ("i", RDF + "nil")) in got


def test_collection_out_of_subset_and_node_xml_attrs():
    # rdf:ID / property attributes on a Collection property element
    # raise (checked BEFORE the parseType branch)
    with pytest.raises(RdfXmlError):
        parse_rdfxml(HDR + '<rdf:Description rdf:about="http://ex/a">'
                     '<ex:p rdf:parseType="Collection" rdf:ID="r"/>'
                     '</rdf:Description></rdf:RDF>')
    with pytest.raises(RdfXmlError):
        parse_rdfxml(HDR + '<rdf:Description rdf:about="http://ex/a">'
                     '<ex:p rdf:parseType="Collection">text'
                     '</ex:p></rdf:Description></rdf:RDF>')
    # xml:* on a NODE element never becomes a garbage property triple
    got = parse_rdfxml(HDR + '<rdf:Description rdf:about="http://ex/a" '
                       'xml:space="preserve" ex:t="v"/></rdf:RDF>')
    preds = {q[1][1] for q in got}
    assert preds == {"http://ex/t"}
