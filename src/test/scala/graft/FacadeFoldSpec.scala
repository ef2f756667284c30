package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.GraftConfig
import graft.api.{Auth, GraftApi, HttpFacade, SecuredGraftApi}
import graft.meta.Fixtures
import graft.model.LifecycleEvent
import graft.orchestration.{Catalog, EngineManager, LocalSparkEngine}

/** The facade's between-requests state fold, pinned as a PROPERTY:
  * dispatching an event sequence in K arbitrary batch splits through
  * `HttpFacade.ingest` (fixed clock) must leave the SAME incubating
  * set and emit the SAME cumulative (pipeline, sources) submissions as
  * dispatching everything at once. This is exactly the invariant the
  * r7 state-fold bug violated (released rows survived incremental
  * dispatch; kept rows duplicated), so it is pinned against seeded
  * random splits, not just the one scenario that caught it. */
class FacadeFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val now = Fixtures.NOW
  private val parents = Seq("clean-orders", "clean-customer", "clean-lineitem",
    "clean-part", "join-orders-customer", "agg-revenue", "ingest-orders")

  private def mkFacade(): HttpFacade = {
    val api = new GraftApi(spark, Catalog(Fixtures.defsDS(spark)),
      Fixtures.edgesDS(spark), new EngineManager(Seq(new LocalSparkEngine(spark))),
      GraftConfig.default)
    val policy = new Auth.Policy(
      new Auth.StaticTokenVerifier(Map("t" -> Seq("Data-Admin"))), apiTokens = Set.empty)
    new HttpFacade(new SecuredGraftApi(api, policy), spark, () => now)
  }

  private def success(id: Long, pipeline: String): LifecycleEvent =
    LifecycleEvent(id, "job_exec_update", "success", pipeline, s"exec-$pipeline-$id",
      now, now, 0, disable_downstream = false)

  private def incubSet(f: HttpFacade): Set[(String, Map[String, String])] =
    f.incubating.get().collect()
      .map(r => (r.pipeline_uuid, r.triggers)).toSet

  (1 to 5).foreach { seed =>
    test(s"property(seed=$seed): incremental ingest == one-shot dispatch (state and submissions)") {
      val rnd = new scala.util.Random(seed)
      val events = (1 to (4 + rnd.nextInt(5))).map(i =>
        success(i.toLong, parents(rnd.nextInt(parents.length))))

      val oneShot = mkFacade()
      val oneSubs = oneShot.ingest(events, now)
        .map(s => (s.pipeline_uuid, s.source_uuids)).toSet

      val incr = mkFacade()
      // split into 2-4 contiguous batches at random cut points
      val cuts = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(events.length)).distinct.sorted
      val batches = (Seq(0) ++ cuts ++ Seq(events.length)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => events.slice(a, b) }.filter(_.nonEmpty).toSeq
      val incrSubs = batches.flatMap(b => incr.ingest(b, now))
        .map(s => (s.pipeline_uuid, s.source_uuids)).toSet

      assert(incrSubs == oneSubs,
        s"submissions diverged for ${events.map(_.pipeline_uuid)} split $batches")
      assert(incubSet(incr) == incubSet(oneShot),
        s"incubating state diverged for ${events.map(_.pipeline_uuid)}")
      // and the event log holds every event exactly once either way
      assert(incr.eventLog.get().count() == events.length)
      assert(incr.eventLog.get().where(col("event_id").isNotNull).count() ==
        oneShot.eventLog.get().count())
    }
  }
}
