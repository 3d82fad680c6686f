package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.scoring.MatchScore

/**
 * The end-to-end username->employee match pipeline — the engine's flagship
 * query, re-expressing the reference's POST-/ pipeline
 * (/root/reference/main.py:136-221) as one declarative Spark plan:
 *
 *   usernames ⟕ [similarity cross join] broadcast(employees)
 *     -> score (MatchScore expression tree)
 *     -> per-username top-k (row_number window, k=4) with threshold >= 50
 *     -> dense-rank confidence labels (ties share a rank — golden semantics
 *        pinned by the reference's assets/example.png)
 *     -> NOT-FOUND sentinel rows via left-anti join
 *
 * Scale design (100 TB usernames, roster-sized employees):
 *  - the employee side is hoisted+broadcast, so the cross join is a
 *    BroadcastNestedLoopJoin with NO shuffle of the big side;
 *  - per-username and per-employee invariants (phonetic codes, splits) are
 *    computed O(U)+O(E) times before the join, not O(U*E) times inside it;
 *  - the only shuffle is the hash-partition on `username` for the window;
 *    both windows (top-k and dense_rank) share one partitioning, and
 *    Spark's WindowGroupLimit pushes the rank<=k limit below the shuffle,
 *    so each map task emits at most k rows per username before exchange.
 *  - deterministic tiebreak (score desc, emp_id asc) — the reference's
 *    pandas unstable sort makes ties unspecified (SURVEY.md §7.4.1).
 */
object MatchPipeline {

  val TopK = 4               // NUM_TOP_GROUP_MATCHES + NUM_ADDITIONAL (main.py:19-21)
  val ScoreThreshold = 50.0  // main.py:22

  private val RankLabels: Column => Column = r =>
    when(r === 1, "HIGH CONFIDENCE")
      .when(r === 2, "2nd HIGH CONFIDENCE")
      .when(r === 3, "3rd HIGH CONFIDENCE")
      .when(r === 4, "NOT SURE")
      .otherwise("")   // dict.get default, main.py:196

  /** Usernames with hoisted scoring invariants. */
  def prepareUsernames(usernames: DataFrame): DataFrame =
    MatchScore.usernameInvariants(col("username")).foldLeft(
      usernames.select(col("username").cast("string").as("username"))
    ) { case (df, (name, c)) => df.withColumn(name, c) }

  /** Canonical employees with hoisted scoring invariants. */
  def prepareEmployees(employees: DataFrame): DataFrame =
    MatchScore.employeeInvariants(col("first_name"), col("last_name"), col("employee_name"))
      .foldLeft(employees) { case (df, (name, c)) => df.withColumn(name, c) }

  /** Scored candidate pairs: every (username, employee) with its score. */
  def scoredPairs(usernames: DataFrame, employees: DataFrame): DataFrame = {
    val u = prepareUsernames(usernames)
    val e = prepareEmployees(employees)
    u.crossJoin(broadcast(e))
      .withColumn("score",
        MatchScore.scoreFromInvariants(
          col("u_norm"), col("u_part1"), col("u_part2"), col("u_sdx"), col("u_mp"),
          col("u_initial"), col("u_dot2_initial"),
          col("e_first"), col("e_last"), col("e_full"),
          col("e_sdx_first"), col("e_sdx_last"), col("e_mp_first"), col("e_mp_last"),
          col("e_first_initial")))
  }

  /** Top-k >= threshold matches per username, dense-rank labeled. */
  def rankedMatches(usernames: DataFrame, employees: DataFrame,
                    topK: Int = TopK, threshold: Double = ScoreThreshold): DataFrame = {
    val byUser = Window.partitionBy(col("username"))
      .orderBy(col("score").desc, col("emp_id").asc)
    // dense_rank orders by score ONLY: equal scores share a rank/label
    // (golden tie semantics from assets/example.png; the row_number window
    // keeps the deterministic emp_id tiebreak for top-k membership)
    val byUserScore = Window.partitionBy(col("username")).orderBy(col("score").desc)
    scoredPairs(usernames, employees)
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= topK && col("score") >= threshold)
      .withColumn("rank", dense_rank().over(byUserScore))
      .withColumn("match_type", RankLabels(col("rank")))
  }

  /**
   * Full output contract of the reference (username, emp_id, emp_name,
   * confidence_score, match_type), including USER NOT FOUND sentinel rows.
   * Blank separator rows (main.py:209) are a CSV-presentation concern and are
   * added only by [[writeCsv]].
   */
  def matchOutput(usernames: DataFrame, employees: DataFrame,
                  topK: Int = TopK, threshold: Double = ScoreThreshold): DataFrame = {
    val found = rankedMatches(usernames, employees, topK, threshold)
      .select(
        col("username"),
        col("emp_id"),
        col("employee_name").as("emp_name"),
        format_string("%.2f%%", col("score")).as("confidence_score"),
        col("match_type"))
    val notFound = usernames
      .select(col("username").cast("string").as("username"))
      .join(found.select("username"), Seq("username"), "left_anti")
      .select(
        col("username"),
        lit("N/A").as("emp_id"),
        lit("USER NOT FOUND").as("emp_name"),
        lit("0.00%").as("confidence_score"),
        lit("USER NOT FOUND").as("match_type"))
    found.unionByName(notFound)
  }

  /** CSV sink with the reference's blank separator rows between username
    * groups (main.py:209-221). */
  def writeCsv(out: DataFrame, path: String): Unit =
    out.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
