"""HtmlExtract vs a python html.parser reference model on adversarial
real-world HTML: quoted '>' inside attributes, unclosed tags, CDATA,
nested/bogus comments, uppercase tags, entity edge cases
(&amp;lt; must single-decode), script/style payloads with tag-like
content, newlines inside tags.

Compared invariant: the WORD SEQUENCE of the visible text (whitespace
collapsed) — html.parser implements the HTML5 tokenizer rules the
regex chain approximates."""
import os
import random
import sys
from html.parser import HTMLParser

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from dask_geomodeling_spark.config import get_spark  # noqa: E402

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
from dask_geomodeling_spark.geometry.sources import DataFrameSource  # noqa
from dask_geomodeling_spark.pipeline.curate import HtmlExtract  # noqa


class RefExtract(HTMLParser):
    """Reference: visible text only (script/style dropped), entities
    decoded once (convert_charrefs), all whitespace collapsed."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = []
        self.skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self.skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self.skip:
            self.skip -= 1

    def handle_data(self, data):
        if not self.skip:
            self.out.append(data)


def ref_words(html):
    p = RefExtract()
    p.feed(html)
    p.close()
    return " ".join(p.out).split()


FIXTURES = [
    ("plain", "<p>Hello world</p><p>Second para</p>"),
    ("quoted-gt", '<p title="a > b">text after</p> tail'),
    ("quoted-gt-img", '<img alt="5 > 3" src="x.png"> visible words'),
    ("single-quoted-gt", "<a href='x' data-v='p > q'>link text</a>"),
    ("unclosed-at-eof", "words before <div class=\"x\""),
    ("bare-lt", "a < b and c > d stay visible"),
    ("nested-comment", "keep <!-- hidden <!-- inner --> tail -->"),
    ("bogus-cdata", "before <![CDATA[ secret ]]> after"),
    ("uppercase", "<P>Upper <SCRIPT>var x = 1;</SCRIPT>case</P>"),
    ("script-string", "<script>s = \"</div>\";</script> shown"),
    ("style-content", "<style>p { color: red; }</style> styled text"),
    ("entity-double", "five &amp;lt; six &amp;amp; seven"),
    ("entities", "a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
    ("newline-in-tag", "<a\nhref=\"x\"\ntitle=\"y\">linked</a> words"),
    ("br-breaks", "line one<br/>line two<br >line three"),
    ("table", "<table><tr><td>c1</td><td>c2</td></tr></table>"),
    ("comment-dashes", "x <!-- a - b -- c --> y"),
    # review-pass-2 check: '<'+letter with an unpaired quote IS
    # tag-shaped per HTML5 — the parser strips it, and so do we
    ("prose-unpaired-quote",
     "we find a<b isn't significant>0.05 in all runs"),
    ("unquoted-attr-quote", "<p class=don't>five good words.</p>"),
]

PIECES = ["<p>The cat sat.</p>", "plain words", "<br>",
          '<div class="a">block</div>', "<script>f();</script>",
          "&amp; &lt; &gt;", '<img alt="a>b">', "<b>bold</b>",
          "<!-- note -->", "<li>item</li>", "tail > text"]
rng = random.Random(1309)
docs = FIXTURES + [
    ("rand%d" % t, " ".join(rng.choice(PIECES)
                            for _ in range(rng.randint(1, 8))))
    for t in range(50)]

df = spark.createDataFrame(
    [(i, name, h) for i, (name, h) in enumerate(docs)],
    "doc_id bigint, name string, html string")
rows = {r["doc_id"]: r["text_extracted"] for r in HtmlExtract(
    DataFrameSource(df, index_column="doc_id"), column="html")
    .plan(spark).collect()}

fails = 0
for i, (name, h) in enumerate(docs):
    if name == "unclosed-at-eof":
        # DOCUMENTED divergence (HtmlExtract docstring): a tag left
        # unclosed at end-of-input stays as literal text; the spec
        # (and html.parser) tokenize it differently — assert the
        # stable implemented behavior instead
        assert rows[i].split() == ["words", "before", "<div",
                                   'class="x"'], rows[i]
        continue
    want = ref_words(h)
    got = rows[i].split()
    if got != want:
        fails += 1
        print("HTML FAIL", name, "| model:", want, "| impl:", got)
        if fails >= 15:
            break
print("DONE fails:", fails, "docs:", len(docs))
