package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal in-process broker speaking the [[graft.sources.mq.HttpMQ]]
  * wire protocol (`?tail` → count, `?from=A&to=B` → lines) — the
  * loopback stand-in for the reference's SQS queue, shared by
  * HttpMQSpec and GraftServiceSpec. */
final class MQBroker {
  private val log = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/q", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val body = log.synchronized {
        if (q == "tail") log.length.toString
        else {
          val params = q.split("&").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
          val (from, to) = (params("from").toLong, params("to").toLong)
          log.zipWithIndex
            .slice(from.toInt, math.min(to, log.length.toLong).toInt)
            .map { case ((ts, msg), off) =>
              s"$off\t$ts\t${Base64.getEncoder.encodeToString(msg.getBytes(StandardCharsets.UTF_8))}"
            }.mkString("\n")
        }
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  server.start()
  val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/q"
  def publish(msg: String, ts: Long = 1706742000000L): Unit =
    log.synchronized { log += ((ts, msg)); () }
  /** Out-of-band removal of the oldest `n` messages — simulates a broker
    * truncating past the committed offset (the MQSourceContract rewind
    * case; a correct source must refuse, never remap). */
  def removeOldest(n: Int): Unit =
    log.synchronized { log.remove(0, math.min(n, log.length)); () }
  def stop(): Unit = server.stop(0)
}
