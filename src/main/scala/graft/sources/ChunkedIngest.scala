package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-granularity ingest: the reference's main build path indexes one
  * FTS document per fixed-size chunk (reference:
  * services/file_chunking_manager.py:660-684 — chunk text as content,
  * whitespace-split of the chunk as identifiers, chunk line range stored;
  * all chunks share the file's path so delete-by-path removes them all).
  *
  * `explode` turns a file-granularity table into a chunk-granularity one
  * with `line_start`/`line_end` columns; [[graft.index.FtsIndexBuilder]]
  * passes them through to the doc store and
  * [[graft.query.FtsIndex]] offsets result line numbers by them.
  */
object ChunkedIngest {

  def explode(source: DataFrame,
              chunkSize: Int = Chunker.DefaultChunkSize): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select($"repo", $"path", $"commit", $"lang", $"content")
      .as[(String, String, String, String, String)]
      .flatMap { case (repo, path, commit, lang, content) =>
        Chunker.chunk(content, chunkSize).map { c =>
          // identifiers = whitespace split of the chunk text (reference
          // chunk-path behavior, file_chunking_manager.py:660-684)
          val ids = c.text.split("\\s+").filter(_.nonEmpty).toSeq
          (repo, path, commit, lang, c.text, ids, c.line_start, c.line_end)
        }
      }
      .toDF("repo", "path", "commit", "lang", "content", "identifiers",
        "line_start", "line_end")
  }
}
