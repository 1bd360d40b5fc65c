

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
