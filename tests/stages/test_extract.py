

class TestTableCells:
    def test_cells_with_noise_entities_and_th(self):
        import pyarrow as pa

        from bioner_ray.stages.extract import extract_table_cells_batch

        html = (
            b'<html><table class="x"><tr><th scope="col">Name</th><th>Val</th></tr>'
            b"<tr><td><b>alpha</b></td><td>1 &amp; 2</td></tr></table>"
            b"<table><tr><td>solo</td></tr></table></html>"
        )
        out = extract_table_cells_batch(
            pa.table({"url": ["u"], "html": pa.array([html], type=pa.binary())})
        ).to_pandas()
        got = list(zip(out.table_idx, out.row_idx, out.col_idx, out.cell))
        assert got == [
            (0, 0, 0, "Name"),
            (0, 0, 1, "Val"),
            (0, 1, 0, "alpha"),
            (0, 1, 1, "1 & 2"),
            (1, 0, 0, "solo"),
        ]

    def test_null_html_and_tableless_pages_emit_nothing(self):
        import pyarrow as pa

        from bioner_ray.stages.extract import extract_table_cells_batch

        out = extract_table_cells_batch(
            pa.table(
                {
                    "url": ["a", "b"],
                    "html": pa.array([None, b"<p>no tables</p>"], type=pa.binary()),
                }
            )
        )
        assert out.num_rows == 0
        assert out.schema.names == ["url", "table_idx", "row_idx", "col_idx", "cell"]


class TestJsonLd:
    def _run(self, html: bytes):
        import pyarrow as pa

        from bioner_ray.stages.extract import extract_jsonld_batch

        return extract_jsonld_batch(
            pa.table(
                {
                    "url": pa.array(["https://a.example/p"], type=pa.string()),
                    "html": pa.array([html], type=pa.binary()),
                }
            )
        )

    def test_nested_object_array_and_context_skip(self):
        html = (
            b'<html><head><script type="application/ld+json">'
            b'{"@context": "https://schema.org", "@type": "Product",'
            b' "name": "widget", "brand": {"@type": "Brand", "name": "acme"},'
            b' "tags": ["a", "b"], "inStock": true, "rating": null}'
            b"</script></head></html>"
        )
        rows = set(
            zip(*(self._run(html).column(c).to_pylist() for c in ("subj", "pred", "obj")))
        )
        s = "https://a.example/p#ld0"
        assert rows == {
            (s, "@type", "Product"),
            (s, "name", "widget"),
            (s, "brand", s + "/brand"),
            (s + "/brand", "@type", "Brand"),
            (s + "/brand", "name", "acme"),
            (s, "tags", "a"),
            (s, "tags", "b"),
            (s, "inStock", "true"),
        }

    def test_malformed_and_absent_blocks_emit_nothing(self):
        assert self._run(b'<script type="application/ld+json">{"x": </script>').num_rows == 0
        assert self._run(b"<html><p>plain</p></html>").num_rows == 0

    def test_list_root_and_object_array_elements(self):
        html = (
            b'<script type="application/ld+json">'
            b'[{"@type": "Person", "name": "x"},'
            b' {"@type": "Person", "knows": [{"name": "y"}]}]'
            b"</script>"
        )
        rows = set(
            zip(*(self._run(html).column(c).to_pylist() for c in ("subj", "pred", "obj")))
        )
        u = "https://a.example/p"
        assert rows == {
            (u + "#ld0_0", "@type", "Person"),
            (u + "#ld0_0", "name", "x"),
            (u + "#ld0_1", "@type", "Person"),
            (u + "#ld0_1", "knows", u + "#ld0_1/knows#0"),
            (u + "#ld0_1/knows#0", "name", "y"),
        }

    def test_pathological_nesting_is_capped_not_crashed(self):
        # 5000 deep: the stdlib DECODER recurses out -> page skipped whole
        blob = '{"child": ' * 5000 + '"x"' + "}" * 5000
        out = self._run(
            b'<script type="application/ld+json">' + blob.encode() + b"</script>"
        )
        assert out.num_rows == 0
        # 200 deep: decodable, flattener caps at _JSONLD_MAX_DEPTH
        blob = '{"child": ' * 200 + '"x"' + "}" * 200
        out = self._run(
            b'<script type="application/ld+json">' + blob.encode() + b"</script>"
        )
        from bioner_ray.stages.extract import _JSONLD_MAX_DEPTH

        assert out.num_rows == _JSONLD_MAX_DEPTH
