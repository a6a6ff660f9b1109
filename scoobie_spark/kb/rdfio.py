"""A1 input breadth: Turtle and RDF/XML dump parsing (+ zip container).

Reference ``connection/RDFTripleParser.java:84-99`` switches on media
type (N-Triples / RDF-XML / Turtle) and container compression (gzip /
bzip2 / zip), stream-parsing each dump on its own thread
(:131-380). Spark re-expression: gz/bz2 decompress transparently inside
``spark.read.text``; zip members are expanded from a ``binaryFile``
scan; Turtle/RDF-XML parse per *file* inside one ``mapInPandas`` pass —
file-level parallelism replaces the reference's thread pool, and a
single dump can be pre-split at statement boundaries upstream when one
file dominates (the DBpedia-style dumps the reference targets are
many-file).

Format scope mirrors what the reference's own data exercises: prefixed
names, ``a``, ``;``/``,`` continuation lists, quoted literals with
``^^type``/``@lang`` tags, comments. One parity quirk is load-bearing:
``test2.ttl``'s final ``@prefix`` directive misses its terminating dot,
and the reference's pipeline resolves later ``ex-ins:`` names against a
null namespace, storing ``http://null<local>`` (frozen in
``scoobie/testdb.script:33-40`` as resource 5). An unterminated
directive here likewise fails to register, and unresolvable prefixed
names expand to ``http://null`` + local name.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRIPLES_SCHEMA = "s string, p string, o string, literal string"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
NULL_NS = "http://null"  # RDFTripleParser null-namespace quirk (testdb.script:33-40)

_TTL_TOKEN = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<uri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[^\s;,.]+)|@[\w\-]+)?)
  | (?P<punct>[;,.])
  | (?P<word>[^\s;,"]+)
    """,
    re.VERBOSE,
)

_UNESCAPE = re.compile(r'\\(["ntr\\])')
_UNESCAPE_MAP = {'"': '"', "n": "\n", "t": "\t", "r": "\r", "\\": "\\"}


def _unescape(s: str) -> str:
    return _UNESCAPE.sub(lambda m: _UNESCAPE_MAP[m.group(1)], s)


def _ttl_tokens(text: str) -> list[str]:
    out = []
    for m in _TTL_TOKEN.finditer(text):
        if m.lastgroup == "comment":
            continue
        tok = m.group(0)
        # a statement terminator glued to a prefixed name ("ex:o.")
        # must tokenize as name + '.': Turtle's PN_LOCAL cannot end in
        # a dot, so trailing dots on word tokens are always terminators
        if m.lastgroup == "word":
            stripped = tok.rstrip(".")
            if stripped and stripped != tok:
                out.append(stripped)
                out.extend("." * (len(tok) - len(stripped)))
                continue
        out.append(tok)
    return out


def parse_turtle_text(text: str) -> list[tuple[str, str, str | None, str | None]]:
    """One Turtle document → [(s, p, o_uri|None, literal|None)]."""
    tokens = _ttl_tokens(text)
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str | None, str | None]] = []
    i, n = 0, len(tokens)

    def resolve(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok == "a":
            return RDF_NS + "type"
        pfx, _, local = tok.partition(":")
        ns = prefixes.get(pfx)
        # unresolvable prefix → the reference's null-namespace expansion
        return (ns if ns is not None else NULL_NS) + local

    while i < n:
        tok = tokens[i]
        if tok in ("@prefix", "@base", "PREFIX", "BASE"):
            if tok in ("@prefix", "PREFIX") and i + 2 < n:
                pfx = tokens[i + 1].rstrip(":")
                uri = tokens[i + 2]
                uri = uri[1:-1] if uri.startswith("<") else uri
                # directive registers ONLY when dot-terminated (@prefix
                # form) — the unterminated-directive parity quirk
                if tok == "PREFIX":  # SPARQL form takes no dot
                    prefixes[pfx] = uri
                    i += 3
                    continue
                if i + 3 < n and tokens[i + 3] == ".":
                    prefixes[pfx] = uri
                    i += 4
                    continue
                i += 3
                continue
            i += 1
            continue
        # statement: subject (predicate object (, object)* ;)* .
        subj = resolve(tok)
        i += 1
        pred: str | None = None
        while i < n:
            t = tokens[i]
            if t == ".":
                i += 1
                break
            if t == ";":
                pred = None
                i += 1
                continue
            if t == ",":
                i += 1
                continue
            if pred is None:
                pred = resolve(t)
                i += 1
                continue
            if t.startswith('"'):
                m = re.match(r'"((?:[^"\\]|\\.)*)"', t)
                triples.append((subj, pred, None, _unescape(m.group(1)) if m else ""))
            else:
                triples.append((subj, pred, resolve(t), None))
            i += 1
    return triples


def parse_rdfxml_text(
    text: str, base: str | None = None
) -> list[tuple[str, str, str | None, str | None]]:
    """One RDF/XML document → [(s, p, o_uri|None, literal|None)].
    Node elements with rdf:about; typed node names become rdf:type
    triples; property elements carry rdf:resource or literal text.
    ``base`` resolves relative rdf:about/rdf:resource references, like
    Sesame's ``conn.add(in, baseURI, ...)`` (the BBC corpora use
    document-relative URIs, loaded against ``http://www.bbc.co.uk/``
    at BBCNatureCorpus.java:95)."""
    import xml.etree.ElementTree as ET
    from urllib.parse import urljoin

    def expand(tag: str) -> str:
        # ElementTree gives '{ns}local'
        return tag[1:].replace("}", "") if tag.startswith("{") else tag

    def resolve(uri: str) -> str:
        # scheme-qualified refs pass through urljoin unchanged
        return urljoin(base, uri) if base else uri

    root = ET.fromstring(text)
    triples: list[tuple[str, str, str | None, str | None]] = []
    about_attr = f"{{{RDF_NS}}}about"
    resource_attr = f"{{{RDF_NS}}}resource"
    for node in root:
        subj = node.get(about_attr)
        if subj is None:
            continue
        subj = resolve(subj)
        node_type = expand(node.tag)
        if node_type != RDF_NS + "Description":
            triples.append((subj, RDF_NS + "type", node_type, None))
        for prop in node:
            pred = expand(prop.tag)
            res = prop.get(resource_attr)
            if res is not None:
                triples.append((subj, pred, resolve(res), None))
            elif prop.text is not None and prop.text.strip():
                triples.append((subj, pred, None, prop.text.strip()))
    return triples


_NT_LINE_RE = re.compile(
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"[^\s]*)\s*\.\s*$'
)


def parse_ntriples_text(text: str) -> list[tuple[str, str, str | None, str | None]]:
    """One N-Triples document → [(s, p, o_uri|None, literal|None)] —
    the text-level twin of ``etl.parse_ntriples`` (same line regex and
    literal unescape) so zip containers of N-Triples dumps parse
    identically to bare/gz dumps (RDFTripleParser.java:84-99 accepts
    the zip container for every media type, not just Turtle/RDF-XML)."""
    triples: list[tuple[str, str, str | None, str | None]] = []
    for line in text.splitlines():
        m = _NT_LINE_RE.match(line)
        if not m:
            continue
        s, p, o, lit = m.groups()
        if o is not None:
            triples.append((s, p, o, None))
        elif lit:
            # _unescape, NOT a $1 backreference: \n must decode to the
            # control character (the letter-n form was the etl.py bug
            # fixed in the Spark path — same rule here so zip-container
            # dumps parse identically to bare/gz dumps)
            triples.append((s, p, None, _unescape(lit)))
    return triples


_PARSERS = {
    "turtle": parse_turtle_text,
    "rdfxml": parse_rdfxml_text,
    "ntriples": parse_ntriples_text,
}


def _parser(fmt: str, base: str | None):
    if base is not None:
        if fmt != "rdfxml":
            raise ValueError("base resolution is only supported for rdfxml")
        return lambda t: parse_rdfxml_text(t, base)
    return _PARSERS[fmt]


def _to_frames(parsed) -> pd.DataFrame:
    return pd.DataFrame(parsed, columns=["s", "p", "o", "literal"]).astype(
        {"s": "string", "p": "string", "o": "string", "literal": "string"}
    )


def parse_rdf_files(
    spark: SparkSession, path: str, fmt: str = "turtle", base: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Distributed parse of Turtle / RDF-XML dumps (gz/bz2 transparent)
    → (object_triples(s,p,o), datatype_triples(s,p,literal)) — the A4
    split, same contract as :func:`scoobie_spark.kb.etl.parse_ntriples`.
    One task per file; statements never cross files."""
    parse = _parser(fmt, base)
    files = spark.read.text(path, wholetext=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for text in pdf["value"]:
                yield _to_frames(parse(text))

    return _split(files.mapInPandas(gen, TRIPLES_SCHEMA))


def parse_rdf_zip(
    spark: SparkSession, path: str, fmt: str = "turtle", base: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Zip-container variant (RDFTripleParser's ZipArchiveInputStream
    case): binaryFile scan → per-member decode + parse inside the Arrow
    pass."""
    import io
    import zipfile

    parse = _parser(fmt, base)
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        text = zf.read(info).decode("utf-8", errors="replace")
                        yield _to_frames(parse(text))

    return _split(files.mapInPandas(gen, TRIPLES_SCHEMA))


def _split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    from pyspark.sql import functions as F

    obj = df.filter(F.col("o").isNotNull()).select("s", "p", "o")
    dat = df.filter(F.col("o").isNull() & F.col("literal").isNotNull()).select(
        "s", "p", "literal"
    )
    return obj, dat
