package graft.services

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Scheduled tasks with no-overlap and run history (D10) — the reference's
  * `CREATE TASK ... SCHEDULE='5 MINUTE' ALLOW_OVERLAPPING_EXECUTION=FALSE`
  * plus TASK_HISTORY (`scripts/16_sync_task_primary.sql:483-527`).
  * Scheduling is driver-side (a Snowflake task is scheduler metadata, not
  * engine work); the bodies submit Spark jobs.
  */
final class TaskScheduler {

  final case class TaskRun(task: String, startedAtMs: Long, durationMs: Long,
                           status: String, message: String)

  private val pool = Executors.newScheduledThreadPool(2)
  private val tasks = new ConcurrentHashMap[String, (() => String, AtomicBoolean)]()
  private val futures = new ConcurrentHashMap[String, ScheduledFuture[_]]()
  private val history = mutable.ArrayBuffer.empty[TaskRun]
  private val suspended = ConcurrentHashMap.newKeySet[String]()

  def define(name: String)(body: => String): Unit =
    tasks.put(name, (() => body, new AtomicBoolean(false)))

  /** Run now unless already running (ALLOW_OVERLAPPING_EXECUTION=FALSE).
    * Returns false when skipped due to overlap or suspension. */
  def runOnce(name: String): Boolean = {
    val (body, running) = tasks.get(name)
    if (suspended.contains(name) || !running.compareAndSet(false, true)) return false
    val t0 = System.currentTimeMillis()
    try {
      val msg = body()
      history.synchronized {
        history += TaskRun(name, t0, System.currentTimeMillis() - t0, "SUCCEEDED", msg)
      }
      true
    } catch {
      case e: Exception =>
        history.synchronized {
          history += TaskRun(name, t0, System.currentTimeMillis() - t0, "FAILED",
            String.valueOf(e.getMessage))
        }
        true
    } finally running.set(false)
  }

  def schedule(name: String, everyMs: Long): Unit =
    futures.put(name, pool.scheduleAtFixedRate(
      () => runOnce(name), everyMs, everyMs, TimeUnit.MILLISECONDS))

  /** `USING CRON <m h dom mon dow> [tz]` (`scripts/33_schema_sync_task.sql:134-139`):
    * one-shot chain — each fire computes the NEXT fire time from the cron
    * spec, so irregular schedules ("0 2 * * *", month boundaries, DST) stay
    * correct where a fixed rate would drift. */
  def scheduleCron(name: String, cronExpr: String): Unit = {
    val cron = CronSchedule.parse(cronExpr)
    crons.put(name, cron)
    planNextCronFire(name, cron)
  }

  private val crons = new ConcurrentHashMap[String, CronSchedule]()

  private def planNextCronFire(name: String, cron: CronSchedule): Unit =
    futures.put(name, pool.schedule(
      new Runnable { def run(): Unit = fireCron(name) },
      cron.nextDelayMs(System.currentTimeMillis()), TimeUnit.MILLISECONDS))

  /** Run the task body, then plant the next fire (package-visible so tests
    * can drive a fire without waiting for wall-clock cron time). */
  private[graft] def fireCron(name: String): Unit = {
    runOnce(name)
    Option(crons.get(name)).foreach(planNextCronFire(name, _))
  }

  /** Next scheduled fire, as epoch millis (SHOW TASKS' next_scheduled_time). */
  def nextScheduledTime(name: String, nowMs: Long = System.currentTimeMillis()): Option[Long] =
    Option(crons.get(name)).map(c => nowMs + c.nextDelayMs(nowMs))

  /** ALTER TASK ... SUSPEND / RESUME. */
  def suspend(name: String): Unit = suspended.add(name)
  def resume(name: String): Unit = suspended.remove(name)
  def isSuspended(name: String): Boolean = suspended.contains(name)

  /** Suspended-task auto-resume, as the heartbeat does
    * (`scripts/31_sync_task_secondary.sql:328-376`). */
  def resumeAllSuspended(): Seq[String] = {
    val names = suspended.asScala.toSeq.sorted
    names.foreach(resume)
    names
  }

  def taskHistory(): Seq[TaskRun] = history.synchronized { history.toSeq }

  def shutdown(): Unit = {
    futures.values.asScala.foreach(_.cancel(false))
    pool.shutdownNow()
  }
}
