"""Shared fixtures: one session-scoped SparkSession + reference-
shaped fixture tables (FIXTURES.md §1-3, CJK text included)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hive_hdfs_practise_spark.schemas import (  # noqa: E402
    MOVIE_SCHEMA,
    ORDER_SCHEMA,
    REVIEW_SCHEMA,
)
from hive_hdfs_practise_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


def _info(movie_id: int, title: str, genres: list[str], average: str = "8.5") -> str:
    import json

    return json.dumps(
        {
            "_id": str(movie_id),
            "title": title,
            "aka": [title + " 别名"],
            "casts": [{"id": "c1", "name": "张三"}],
            "directors": [{"id": "d1", "name": "李四"}],
            "writers": [],
            "countries": ["中国大陆"],
            "genres": genres,
            "languages": ["汉语普通话"],
            "duration": "120分钟",
            "episodes": "",
            "imdb": "tt0000001",
            "poster": "http://example.invalid/p.jpg",
            "price": 65.0,
            "pubdate": json.dumps(["1994-09-10(多伦多电影节)"]),
            "rating": {"average": average, "rating_people": "1000", "stars": ["5", "4", "3", "2", "1"]},
            "season_count": "",
            "site": "",
            "summary": "一部关于希望的电影。" * 5,
            "year": "1994",
        },
        ensure_ascii=False,
    )


@pytest.fixture(scope="session")
def movie_df(spark):
    rows = [
        (1299731, "肖申克的救赎 The Shawshank Redemption", 65.0, 9.7, _info(1299731, "肖申克的救赎", ["剧情", "犯罪"])),
        (10746041, "野狼 Hombre", 80.5, 7.2, _info(10746041, "野狼", ["西部"])),
        (2133323, "活着 To Live", 55.0, 9.3, _info(2133323, "活着", ["剧情", "历史"])),
        (3000001, "未评分电影 Unrated", 70.0, None, _info(3000001, "未评分", ["剧情"], average="")),
        (3000002, "海上钢琴师", 60.0, 9.3, _info(3000002, "海上钢琴师", ["剧情", "音乐"])),
    ]
    return spark.createDataFrame(rows, MOVIE_SCHEMA)


@pytest.fixture(scope="session")
def review_df(spark):
    rows = [
        (1, 1299731, 10.0, "希望让人自由。非常经典。"),
        (2, 1299731, 9.0, "百看不厌 great movie"),
        (3, 2133323, 9.0, "福贵的一生。"),
        (4, 10746041, 7.0, "西部片佳作"),
        (5, 3000002, 9.0, "1900 的传奇"),
    ]
    return spark.createDataFrame(rows, REVIEW_SCHEMA)


@pytest.fixture(scope="session")
def order_df(spark):
    rows = [
        (1, 1299731, "肖申克的救赎 The Shawshank Redemption", 2, 130.0, "2015-01-08 10:00:00"),
        (2, 10746041, "野狼 Hombre", 1, 80.5, "2016-03-15 12:30:00"),
        (3, 2133323, "活着 To Live", 3, 165.0, "2016-03-20 18:00:00"),
        (4, 3000002, "海上钢琴师", 1, 60.0, "2017-07-01 09:10:00"),
        (5, 1299731, "肖申克的救赎 The Shawshank Redemption", 2, 130.0, "2017-11-11 11:11:11"),
        (6, 2133323, "活着 To Live", 1, 55.0, "2019-11-08 20:45:00"),
    ]
    return spark.createDataFrame(rows, ORDER_SCHEMA)
