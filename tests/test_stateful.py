"""applyInPandasWithState custom stateful operator: state must persist
ACROSS micro-batches (the property a per-batch aggregate cannot give)."""

from __future__ import annotations

import os

from event_driven_etl_msc_research_spark.datagen import (
    ChangeStreamSpec,
    generate_change_stream,
)
from event_driven_etl_msc_research_spark.schemas import CHANGE_EVENT_SCHEMA_EVOLVED
from event_driven_etl_msc_research_spark.sources.changelog import (
    read_changelog_batch,
    read_changelog_stream,
)
from event_driven_etl_msc_research_spark.streaming.stateful import (
    conversation_digest_batch,
    conversation_digest_stream,
)


def test_digest_state_survives_batches(spark, tmp_root):
    log = os.path.join(tmp_root, "log")
    generate_change_stream(
        log,
        ChangeStreamSpec(n_events=3000, n_convs=50, segment_size=500,
                         seed=17, dup_segments=()),
    )
    stream = read_changelog_stream(
        spark, log, schema=CHANGE_EVENT_SCHEMA_EVOLVED, max_files_per_trigger=2
    )
    q = (
        conversation_digest_stream(stream)
        .writeStream.format("memory")
        .queryName("digest")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmp_root, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) >= 3  # state genuinely crossed batches

    # final digest per conv = the emission with the highest n_events
    emitted = spark.table("digest").toPandas()
    final = emitted.loc[emitted.groupby("conv_id")["n_events"].idxmax()]
    got = final.sort_values("conv_id").reset_index(drop=True)

    exp = (
        conversation_digest_batch(
            read_changelog_batch(spark, log, schema=CHANGE_EVENT_SCHEMA_EVOLVED)
        )
        .orderBy("conv_id")
        .toPandas()
    )
    cols = ["conv_id", "n_events", "max_lsn", "last_role", "last_ts"]
    assert got[cols].reset_index(drop=True).equals(exp[cols].reset_index(drop=True))
