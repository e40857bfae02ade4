package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}
import graft.config.{BatcherConfig, BatchSplitter}
import graft.core.Pipeline
import graft.model.Message

/** ScalaCheck properties for the batch splitter (FIXTURES.md A4): batches
  * concatenate back to the input, and no batch overruns the accumulator
  * budget by more than one message (the emitting message closes the batch).
  */
object SplitterPropSpec extends Properties("BatchSplitter") {

  private val budget = 10L
  private val splitter = BatchSplitter[Int](0L, (m, acc) => {
    val next = acc + m.data
    (next >= budget, next)
  })
  private val bc = BatcherConfig[Int]("default", batchSplitter = Some(splitter))

  private val msgsGen: Gen[List[Message[Int]]] =
    Gen.listOf(Gen.chooseNum(1, 9)).map(_.map(i => Message(i)))

  property("concatenation preserves input") = forAll(msgsGen) { msgs =>
    val out = Pipeline.splitBatches(msgs, bc)
    out.flatMap(_._1) == msgs
  }

  property("every size-triggered batch meets the budget exactly once") =
    forAll(msgsGen) { msgs =>
      val out = Pipeline.splitBatches(msgs, bc)
      out.filter(_._2 == "size").forall { case (batch, _) =>
        val sum = batch.map(_.data).sum
        // reached budget with the last message, not before
        sum >= budget && (sum - batch.last.data) < budget
      }
    }

  property("at most one non-size trailing batch") = forAll(msgsGen) { msgs =>
    val out = Pipeline.splitBatches(msgs, bc)
    out.count(_._2 != "size") <= 1 &&
    out.zipWithIndex.filter(_._1._2 != "size").forall(_._2 == out.size - 1)
  }

  private val fixedBc = BatcherConfig[Int]("default", batchSize = 7)

  property("fixed-size batching: all full except possibly the last") =
    forAll(msgsGen) { msgs =>
      val out = Pipeline.splitBatches(msgs, fixedBc)
      out.flatMap(_._1) == msgs &&
      out.dropRight(1).forall(_._1.size == 7) &&
      out.lastOption.forall(_._1.size <= 7)
    }
}
