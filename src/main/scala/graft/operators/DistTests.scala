package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two/k-sample distribution tests (SURVEY §2.4 A14;
  * `/root/reference/direction_analysis.ipynb` cells 92-97 uses
  * scipy.anderson_ksamp + mannwhitneyu between per-ticker OI samples).
  *
  * Both tests reduce to ORDERED-WINDOW arithmetic over the pooled sample —
  * one shuffle on (group, value order), no collect:
  *
  *  - Mann-Whitney U: rank-sum with tie-averaged ranks.
  *  - Anderson-Darling k-sample (Scholz-Stephens A²kN, continuous/no-tie
  *    form): A² = (1/N) Σ_i (1/n_i) Σ_{j=1}^{N-1}
  *    (N·M_ij − j·n_i)² / (j(N−j)), with M_ij = #{sample-i values ≤ j-th
  *    pooled order statistic}. M_ij is a running per-sample count over the
  *    pooled order — i.e. window functions.
  */
object DistTests {

  /** Mann-Whitney U of `sampleA` vs the rest within each `groupCols`
    * partition (tie-averaged ranks; U = R_A - n_A(n_A+1)/2). */
  def mannWhitneyU(df: DataFrame, groupCols: Seq[String],
                   sampleCol: String, sampleA: String, valueCol: String)
      : DataFrame = {
    val byG = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol))
    val cntEq = count(lit(1)).over(
      Window.partitionBy((groupCols.map(col) :+ col(valueCol)): _*))
    val avgRank = (rank().over(byG) * 2 + cntEq - 1).cast("double") / 2.0
    df.withColumn("__r", avgRank)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col(sampleCol) === sampleA, col("__r"))
          .otherwise(0.0)).as("rank_sum_a"),
        sum(when(col(sampleCol) === sampleA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(sampleCol) =!= sampleA, 1L).otherwise(0L)).as("n_b"))
      .withColumn("u_stat",
        col("rank_sum_a") - col("n_a") * (col("n_a") + 1) / 2.0)
  }

  /** Anderson-Darling k-sample statistic per `groupCols` partition.
    * `sampleCol` labels the k samples. Continuous-data form (version 1 of
    * Scholz-Stephens eq. 3); ties broken deterministically by `tieBreak`.
    * Returns one row per group: a2kn + N + k. */
  def andersonDarlingK(df: DataFrame, groupCols: Seq[String],
                       sampleCol: String, valueCol: String,
                       tieBreak: String): DataFrame = {
    val g = groupCols.map(col)
    val pooled = Window.partitionBy(g: _*)
      .orderBy(col(valueCol), col(tieBreak))
    val bySample = Window.partitionBy((g :+ col(sampleCol)): _*)
      .orderBy(col(valueCol), col(tieBreak))
    // j = pooled position; m = running count within own sample = M_ij at
    // the j-th pooled order statistic for the sample that OWNS row j...
    // For the sum we need M_ij for EVERY sample i at every j — but the
    // inner sum decomposes: group rows by sample i and accumulate each
    // sample's own running count at each pooled j via a windowed
    // last-value. Implementation: for sample i, M_i(j) only changes at
    // rows of sample i; carry it forward with a conditional running count.
    val N = count(lit(1)).over(Window.partitionBy(g: _*))
    val nI = count(lit(1)).over(
      Window.partitionBy((g :+ col(sampleCol)): _*))
    val withPos = df
      .withColumn("__j", row_number().over(pooled).cast("double"))
      .withColumn("__mi", row_number().over(bySample).cast("double"))
      .withColumn("__N", N.cast("double"))
      .withColumn("__ni", nI.cast("double"))
    // Term contributed by sample i between pooled positions where its
    // running count is constant: for each row of sample i at pooled pos j
    // with running count m, the count m applies for pooled positions
    // j .. j'-1 (until sample i's next row at j'). Sum over that range of
    // (N·m − j·n_i)²/(j(N−j)) — evaluated by attaching the NEXT same-
    // sample pooled position and expanding the inner sum per segment.
    val nextJ = lead(col("__j"), 1).over(bySample)
    val seg = withPos.withColumn("__jNext",
      coalesce(nextJ, col("__N"))) // last segment runs to N-1 (loop < N)
    // PREFIX segments: pooled positions before a sample's first own row
    // have M_i = 0 — their terms (j*n_i)²/(j(N-j)) still count
    val prefixSeg = withPos
      .groupBy((g :+ col(sampleCol)): _*)
      .agg(min(col("__j")).as("__jNext"), first(col("__N")).as("__N"),
        first(col("__ni")).as("__ni"))
      .withColumn("__j", lit(1.0))
      .withColumn("__mi", lit(0.0))
      .filter(col("__jNext") > 1.0)
    val allSegs = seg
      .select((g :+ col(sampleCol) :+ col("__j") :+ col("__jNext") :+
        col("__mi") :+ col("__N") :+ col("__ni")): _*)
      .unionByName(prefixSeg.select((g :+ col(sampleCol) :+ col("__j") :+
        col("__jNext") :+ col("__mi") :+ col("__N") :+ col("__ni")): _*))
    // explode each segment into its pooled positions: segments are short
    // on average (N/n_i); sequence+explode keeps it distributed. Guard
    // empty segments (j > jNext-1): Spark's sequence counts DOWN for
    // inverted bounds rather than returning empty.
    val expanded = allSegs
      .filter(col("__j") < col("__jNext"))
      .withColumn("__jj",
        explode(sequence(col("__j").cast("long"),
          (col("__jNext") - 1).cast("long"))))
      .filter(col("__jj") < col("__N")) // j ranges 1..N-1
      .withColumn("__term",
        pow(col("__N") * col("__mi") - col("__jj") * col("__ni"), 2.0) /
          (col("__jj") * (col("__N") - col("__jj"))))
    expanded.groupBy(g: _*)
      .agg(
        (sum(col("__term") / col("__ni")) / first(col("__N")))
          .as("a2kn"),
        first(col("__N")).cast("long").as("n_pooled"),
        countDistinct(col(sampleCol)).as("k_samples"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, with Cramér's V effect size — MI's hypothesis-test
    * sibling (same contingency machinery, calibrated null). Zero cells
    * of the |X|×|Y| grid contribute their full expected count, so the
    * grid is densified from the marginals (a tiny O(|X|·|Y|) cross of
    * the two marginal frames) — NOT skipped, which would understate
    * chi². Same scale shape as [[mutualInformation]]: one joint-count
    * shuffle, everything after runs on O(|X|·|Y|) rows. Terms are
    * quantized to micro LONGs before the sum (order-independent,
    * engine-exact). Returns chi2_micro, dof, n, and cramers_v_micro
    * (NULL when min(|X|,|Y|) = 1 — no association is measurable). */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    // marginals re-key to fresh names: the grid and the joint share a
    // lineage, and a grid-vs-joint join on the original attributes trips
    // Spark's ambiguous-self-join detection
    val mx = joint.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
      .withColumnRenamed("__x", "__gx")
    val my = joint.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
      .withColumnRenamed("__y", "__gy")
    val nTot = joint.agg(sum(col("__c")).as("__n"))
    val grid = mx.crossJoin(my).crossJoin(broadcast(nTot))
    val cells = grid
      .join(joint, col("__gx") <=> col("__x") &&
        col("__gy") <=> col("__y"), "left")
      .withColumn("__o", coalesce(col("__c"), lit(0L)))
    val expected = col("__cx").cast("double") * col("__cy") / col("__n")
    val term = (col("__o") - expected) * (col("__o") - expected) / expected
    cells.agg(
        sum(floor(term * lit(1e6) + lit(0.5)).cast("long"))
          .as("chi2_micro"),
        first(col("__n")).as("n"))
      .crossJoin(broadcast(
        mx.agg(count(lit(1)).as("__nx"))
          .crossJoin(my.agg(count(lit(1)).as("__ny")))))
      .select(col("chi2_micro"), col("n"),
        ((col("__nx") - 1) * (col("__ny") - 1)).as("dof"),
        when(least(col("__nx"), col("__ny")) > 1,
          floor(sqrt(col("chi2_micro").cast("double") / lit(1e6) /
            (col("n") * (least(col("__nx"), col("__ny")) - 1))) *
            lit(1e6) + lit(0.5)).cast("long"))
          .as("cramers_v_micro"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * dependence probe behind feature selection, leakage detection
    * ("does this metadata column predict the label?"), and
    * stratification checks. MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over
    * the joint distribution; 0 iff independent.
    *
    * ONE corpus shuffle (the joint (x, y) count — partial-aggregated);
    * marginals are second-level aggregates of the O(|X|·|Y|) joint
    * frame, joined back broadcast. Every probability is a ratio of
    * exact integer counts, and each pair's term is quantized to a
    * pico-nat LONG before the final sum — order-independent and
    * engine-portable (the ln of identical doubles bit-matches, the
    * charEntropy precedent). NULL categories count as their own level
    * (null-safe grouping). Returns one row: `mi_pico` (LONG pico-nats),
    * `mi_nats` (double view), `n` rows, `n_pairs` distinct cells. */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
    val nTot = joint.agg(sum(col("__c")).as("__n"))
    // null-safe joins: a NULL category is a real level of the marginal
    val withM = joint
      .join(broadcast(mx), joint("__x") <=> mx("__x"), "inner")
      .drop(mx("__x"))
      .join(broadcast(my), joint("__y") <=> my("__y"), "inner")
      .drop(my("__y"))
      .crossJoin(broadcast(nTot))
    val term = (col("__c").cast("double") / col("__n")) *
      log((col("__c").cast("double") * col("__n")) /
        (col("__cx").cast("double") * col("__cy")))
    withM.agg(
        sum(floor(term * lit(1e12) + lit(0.5)).cast("long"))
          .as("mi_pico"),
        first(col("__n")).as("n"),
        count(lit(1)).as("n_pairs"))
      .select(col("mi_pico"),
        (col("mi_pico").cast("double") / lit(1e12)).as("mi_nats"),
        col("n"), col("n_pairs"))
  }
}
