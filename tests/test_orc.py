"""ORC record-assembly tests (r14): parse_orc_records vs pyarrow."""



def test_orc_record_assembly_matches_pyarrow():
    # r14: parse_orc_records (PRESENT-null re-interleave over the shared
    # stripe decode) against the reference C++ reader, every column type
    import datetime
    import io

    import pyarrow.orc as _orc

    from flink_gmall2024_realtime_spark.operators.orcmeta import (
        parse_orc_records,
        synth_orc_data,
    )

    def norm(v):
        if isinstance(v, datetime.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            return int(v.timestamp() * 1_000_000)
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        return v

    for seed in (0, 3, 7, 11):
        p = synth_orc_data(seed)
        recs = parse_orc_records(p)
        ref = _orc.ORCFile(io.BytesIO(p)).read()
        for col in ref.column_names:
            assert recs[col] == [norm(v) for v in ref[col].to_pylist()], (
                seed,
                col,
            )
