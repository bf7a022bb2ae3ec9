"""PII detection/redaction — hand-written cases; the driver gate
value-checks counts AND redacted-text md5 at sf0.01 (`pii_redact`)."""

from xapian_spark.pipeline.pii import pii_stats, redact_pii


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_all_three_classes(spark):
    r = pii_stats(_df(spark, [
        (1, "mail a.b+c@sub.example.org or x@y.io, "
            "call 415-555-0199, host 10.20.30.40"),
    ])).collect()[0]
    assert r["n_emails"] == 2
    assert r["n_phones"] == 1
    assert r["n_ips"] == 1
    assert r["n_pii"] == 4


def test_redaction_replaces_with_tags(spark):
    out = redact_pii(_df(spark, [
        (1, "write bob@example.com from 192.168.0.1 tel 555.867.5309"),
    ])).collect()[0]["text"]
    assert out == "write <EMAIL> from <IP> tel <PHONE>"


def test_numeric_domain_is_ip_not_email(spark):
    # the email pattern requires an alphabetic TLD, so "a@1.2.3.44" is
    # not an email — its address part is picked up by the IP pass
    r = pii_stats(_df(spark, [(1, "a@1.2.3.44 and 5.6.7.8")])).collect()[0]
    assert r["n_emails"] == 0
    assert r["n_ips"] == 2
    assert r["n_pii"] == 2


def test_email_consumed_before_digit_passes(spark):
    # an alphabetic-TLD email whose local part is digits is consumed by
    # the email pass, leaving nothing for phone/IP
    r = pii_stats(_df(spark, [(1, "x 555.867.5309@spam.net y")])).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_phones"] == 0
    assert r["n_ips"] == 0


def test_ip_not_counted_as_phone(spark):
    r = pii_stats(_df(spark, [(1, "addr 172.16.254.1 only")])).collect()[0]
    assert r["n_ips"] == 1
    assert r["n_phones"] == 0


def test_clean_text_untouched(spark):
    rows = redact_pii(_df(spark, [
        (1, "no personal data here, version 1.2 at 3 pm"),
    ])).collect()
    assert rows[0]["text"] == "no personal data here, version 1.2 at 3 pm"
    s = pii_stats(_df(spark, [(1, "no personal data here")])).collect()[0]
    assert s["n_pii"] == 0
