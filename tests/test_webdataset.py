"""WebDataset-style tar shard sink/reader (sources/webdataset.py):
round-trip fidelity, byte determinism, resume semantics (skip done
shards, rewrite missing ones, reject layout changes), and partial-tar
hygiene."""

import glob
import hashlib
import json
import os
import tarfile

import pyarrow as pa
import pytest


def _images_table(n=40):
    from markdown_lab_ray.sources.synth import SiteSpec, build_images_table

    return build_images_table(SiteSpec(n_images=n))


def _sha256s(out_dir):
    return {os.path.basename(p): hashlib.sha256(
        open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(out_dir, "shard-*.tar")))}


def test_webdataset_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    table = _images_table()
    out = str(tmp_path / "wds")
    written = write_webdataset_shards(
        rd.from_arrow(table).repartition(4), out, n_shards=6)
    assert written  # at least one shard produced
    back = read_webdataset_shards(out).to_pandas()
    assert len(back) == table.num_rows
    src = {r["image_id"]: r for r in table.to_pylist()}
    for _, row in back.iterrows():
        want = src[row["key"]]
        assert bytes(row["bytes"]) == want["bytes"]
        assert row["caption"] == want["caption"]
        meta = json.loads(row["meta_json"])
        assert meta["w"] == want["w"] and meta["h"] == want["h"]
        assert meta["fmt"] == want["fmt"] and meta["phash"] == want["phash"]


def test_webdataset_deterministic_bytes(ray_session, tmp_path):
    """Two independent runs over the same table produce byte-identical
    tars (zeroed tar metadata + key-sorted members)."""
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import write_webdataset_shards

    table = _images_table(30)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(rd.from_arrow(table).repartition(3), a,
                            n_shards=4)
    write_webdataset_shards(rd.from_arrow(table).repartition(7), b,
                            n_shards=4)
    assert _sha256s(a) == _sha256s(b)


def test_webdataset_resume_skips_done_rewrites_missing(ray_session,
                                                       tmp_path):
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    table = _images_table(40)
    out = str(tmp_path / "wds")
    ds = rd.from_arrow(table)
    first = write_webdataset_shards(ds, out, n_shards=6)
    before = _sha256s(out)
    # simulate a crash: one shard loses tar + sentinel
    victim = first[0]
    os.unlink(os.path.join(out, f"shard-{victim:05d}.tar"))
    os.unlink(os.path.join(out, f"shard-{victim:05d}.done"))
    second = write_webdataset_shards(ds, out, n_shards=6)
    assert second == [victim]  # only the missing shard was rewritten
    assert _sha256s(out) == before  # and it came back byte-identical
    assert len(read_webdataset_shards(out).to_pandas()) == table.num_rows


def test_webdataset_rejects_layout_change(ray_session, tmp_path):
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import write_webdataset_shards

    table = _images_table(10)
    out = str(tmp_path / "wds")
    write_webdataset_shards(rd.from_arrow(table), out, n_shards=4)
    with pytest.raises(ValueError, match="sharding parameters changed"):
        write_webdataset_shards(rd.from_arrow(table), out, n_shards=8)


def test_webdataset_reader_ignores_partial_tar(ray_session, tmp_path):
    """A tar without its sentinel (writer crashed) is invisible to the
    reader; a lingering .tmp is wiped by the next writer run."""
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    table = _images_table(20)
    out = str(tmp_path / "wds")
    write_webdataset_shards(rd.from_arrow(table), out, n_shards=4)
    complete = len(read_webdataset_shards(out).to_pandas())
    sentinels = sorted(glob.glob(os.path.join(out, "shard-*.done")))
    os.unlink(sentinels[0])  # its tar is now "partial"
    tmp = os.path.join(out, "shard-99999.tar.tmp")
    open(tmp, "wb").write(b"junk")
    visible = read_webdataset_shards(out).to_pandas()
    assert len(visible) < complete
    write_webdataset_shards(rd.from_arrow(table), out, n_shards=4)
    assert not os.path.exists(tmp)
    assert len(read_webdataset_shards(out).to_pandas()) == complete


def test_tar_members_sorted_and_grouped(ray_session, tmp_path):
    """Within a shard, members appear key-sorted as (.bin, .txt, .json)
    triples — the contiguous-sample layout streaming readers rely on."""
    import ray.data as rd

    from markdown_lab_ray.sources.webdataset import write_webdataset_shards

    table = _images_table(24)
    out = str(tmp_path / "wds")
    write_webdataset_shards(rd.from_arrow(table), out, n_shards=2)
    for tar_path in glob.glob(os.path.join(out, "shard-*.tar")):
        with tarfile.open(tar_path) as tar:
            names = tar.getnames()
        stems = [os.path.splitext(n)[0] for n in names]
        assert stems == sorted(stems)
        for i in range(0, len(names), 3):
            assert [os.path.splitext(n)[1] for n in names[i:i + 3]] == \
                [".bin", ".txt", ".json"]
            assert len({os.path.splitext(n)[0] for n in names[i:i + 3]}) == 1
