"""Object-store (S3A) session wiring — reference parity for dl.cfg +
etl.py:12-16,26-29. No network: asserts confs land, never touches S3."""

from udacity_data_engineering_spark.session import (
    configure_object_store,
    load_credentials,
    s3a_confs,
)


def test_load_credentials_strips_dl_cfg_quotes(tmp_path):
    cfg = tmp_path / "dl.cfg"
    cfg.write_text(
        "[AWS]\nAWS_ACCESS_KEY_ID='AKIAEXAMPLE'\nAWS_SECRET_ACCESS_KEY=\"sekrit\"\n"
    )
    creds = load_credentials(str(cfg))
    assert creds["access_key"] == "AKIAEXAMPLE"
    assert creds["secret_key"] == "sekrit"


def test_load_credentials_env_fallback(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "from-env")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "env-secret")
    creds = load_credentials(None)
    assert creds["access_key"] == "from-env"
    assert creds["secret_key"] == "env-secret"


def test_load_credentials_missing_file_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_credentials(str(tmp_path / "nope.cfg"))


def test_s3a_confs_mapping():
    confs = s3a_confs(
        {"access_key": "AK", "secret_key": "SK", "session_token": "TOK"},
        endpoint="http://minio:9000",
    )
    assert confs["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert confs["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert confs["spark.hadoop.fs.s3a.session.token"] == "TOK"
    assert "TemporaryAWSCredentialsProvider" in confs["spark.hadoop.fs.s3a.aws.credentials.provider"]
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    # cloud-native commit path (no rename-based commit on S3)
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"


def test_configure_object_store_lands_on_live_session(spark, tmp_path):
    cfg = tmp_path / "dl.cfg"
    cfg.write_text("[AWS]\nAWS_ACCESS_KEY_ID='runtime-ak'\nAWS_SECRET_ACCESS_KEY='runtime-sk'\n")
    configure_object_store(spark, str(cfg))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "runtime-ak"
    assert hconf.get("fs.s3a.secret.key") == "runtime-sk"
    assert hconf.get("fs.s3a.committer.name") == "magic"
