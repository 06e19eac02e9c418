"""sources/scanstage.py — hardlink scan staging: the link dir must be
a faithful, basename-preserving view of the group, and every condition
that would break provenance or semantics must DECLINE (return None)
rather than stage."""

import os

from mini_data_platform_spark.sources.scanstage import (
    STAGE_MIN_FILES,
    cleanup_dirs,
    stage_link_dir,
)


def _mk(tmp_path, n, name=lambda i: f"f{i:04d}.csv"):
    d = tmp_path / "src"
    d.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        p = d / name(i)
        p.write_text(f"a,b\n{i},x\n")
        paths.append(str(p))
    return paths


class TestStageLinkDir:
    def test_links_preserve_basenames_and_content(self, tmp_path):
        paths = _mk(tmp_path, STAGE_MIN_FILES)
        d = stage_link_dir(paths)
        assert d is not None
        try:
            assert sorted(os.listdir(d)) == [
                os.path.basename(p) for p in paths
            ]
            # hardlink, not copy: same inode, so a later move/delete of
            # the original never invalidates an in-flight scan
            st = os.stat(os.path.join(d, os.path.basename(paths[0])))
            assert st.st_ino == os.stat(paths[0]).st_ino
            with open(os.path.join(d, os.path.basename(paths[3]))) as fh:
                assert fh.read() == "a,b\n3,x\n"
        finally:
            cleanup_dirs([d])
        assert not os.path.isdir(d)

    def test_declines_small_groups(self, tmp_path):
        paths = _mk(tmp_path, STAGE_MIN_FILES - 1)
        assert stage_link_dir(paths) is None

    def test_declines_duplicate_basenames(self, tmp_path):
        paths = _mk(tmp_path, STAGE_MIN_FILES)
        d2 = tmp_path / "other"
        d2.mkdir()
        dup = d2 / os.path.basename(paths[0])
        dup.write_text("a,b\n9,y\n")
        assert stage_link_dir(paths + [str(dup)]) is None

    def test_declines_missing_file(self, tmp_path):
        paths = _mk(tmp_path, STAGE_MIN_FILES)
        assert stage_link_dir(paths + [str(tmp_path / "gone.csv")]) is None

    def test_link_failure_rolls_back(self, tmp_path, monkeypatch):
        paths = _mk(tmp_path, STAGE_MIN_FILES)
        calls = {"n": 0}
        real = os.link

        def flaky(src, dst):
            calls["n"] += 1
            if calls["n"] == 10:  # e.g. EXDEV on a cross-device tempdir
                raise OSError(18, "Invalid cross-device link")
            return real(src, dst)

        monkeypatch.setattr(os, "link", flaky)
        import glob
        import tempfile

        before = set(
            glob.glob(os.path.join(tempfile.gettempdir(), "mdp_scanstage_*"))
        )
        assert stage_link_dir(paths) is None
        after = set(
            glob.glob(os.path.join(tempfile.gettempdir(), "mdp_scanstage_*"))
        )
        assert after == before, "partial staging dir leaked"
