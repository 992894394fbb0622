from sema_spark.config import DEFAULT_EXTENSIONS, PipelineConfig


def _df(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1] if len(r) > 1 else "x" * 100) for r in rows],
        "path string, content string",
    )


def test_defaults_match_reference():
    cfg = PipelineConfig()
    assert cfg.max_file_size == 10_485_760
    assert len(cfg.file_extensions) == 71  # exact reference count (config/mod.rs:30-102)
    assert "rs" in cfg.file_extensions and "tsv" in cfg.file_extensions
    assert ".git" in cfg.exclude_patterns and "*.log" in cfg.exclude_patterns


def test_extension_filter(spark):
    cfg = PipelineConfig()
    df = _df(spark, [("a.py",), ("b.unknownext",), ("noext",), ("c.PY",), ("d.tar.gz",)])
    kept = {r.path for r in cfg.apply(df).collect()}
    assert kept == {"a.py", "c.PY"}  # normalized lowercase; no-ext dropped; gz not allowed


def test_exclude_and_hidden(spark):
    cfg = PipelineConfig()
    df = _df(
        spark,
        [
            ("src/ok.py",),
            ("node_modules/x.js",),
            ("target/debug/y.rs",),
            ("deep/.git/z.py",),
            (".hidden/a.py",),
            ("src/.secret.py",),
            ("debug.tmp",),
            ("x.log",),  # *.log excluded even though log ∈ extensions
        ],
    )
    kept = {r.path for r in cfg.apply(df).collect()}
    assert kept == {"src/ok.py"}


def test_size_bounds(spark):
    cfg = PipelineConfig(min_content_chars=50, max_file_size=200)
    df = spark.createDataFrame(
        [("small.py", "x" * 10), ("ok.py", "x" * 100), ("big.py", "x" * 500), ("null.py", None)],
        "path string, content string",
    )
    kept = {r.path for r in cfg.apply(df).collect()}
    assert kept == {"ok.py"}


def test_toml_roundtrip(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        '[general]\nmax_file_size = 1234\nfile_extensions = ["py", "rs"]\ninclude_hidden = true\n'
    )
    cfg = PipelineConfig.from_toml(str(p))
    assert cfg.max_file_size == 1234
    assert cfg.file_extensions == ["py", "rs"]
    assert cfg.include_hidden is True
    assert cfg.min_content_chars == 50  # default kept
