from lucene_mapreduce_spark.datagen.transcripts import (
    TRANSCRIPT_SCHEMA,
    gen_transcripts_pandas,
    transcripts_df,
)

__all__ = ["TRANSCRIPT_SCHEMA", "gen_transcripts_pandas", "transcripts_df"]
