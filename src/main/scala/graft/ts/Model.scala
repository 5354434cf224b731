package graft.ts

/** Typed data model of the MPEG2-TS / PSI domain (SURVEY.md §1.1).
  * Field layouts follow ISO/IEC 13818-1 and ETSI EN 300 468 as implemented
  * by the reference (`mpeg2ts/src/ts.h:37-202`, `psi.h:92-293`,
  * `psi_dvb.h:55-112`) — re-declared here as Spark-encodable case classes.
  * Widths: uint13 PID → Int, 42-bit PCR (33-bit base ×300 + 9-bit ext,
  * 27 MHz) → Long.
  */

/** Optional per-packet adaptation field (`ts.h:77-153`).
  * `privateData`/`extension` flag the TLV content carried opaquely in
  * `remainder`, so decode→encode is byte-lossless. */
case class AdaptationField(
    length: Int,
    discontinuity: Boolean,
    randomAccess: Boolean,
    esPriority: Boolean,
    pcr: Option[Long],  // base*300 + ext, 27 MHz ticks (`ts.h:122-133`)
    opcr: Option[Long],
    spliceCountdown: Option[Int],
    privateData: Boolean,
    extension: Boolean,
    remainder: Array[Byte])

/** One 188-byte transport packet (`ts.h:156-202`); `seq` is the ingest
  * order assigned by the source (drives CC/reassembly ordering). */
case class TsPacket(
    seq: Long,
    pid: Int,
    tei: Boolean,
    pusi: Boolean,
    priority: Boolean,
    scrambling: Int,
    hasAf: Boolean,
    hasPayload: Boolean,
    cc: Int,
    af: Option[AdaptationField],
    payload: Array[Byte])

/** A reassembled PSI section with its parsed generic header
  * (`psi.h:92-187`): section bytes include header + body + CRC32. */
case class PsiSection(
    pid: Int,
    firstSeq: Long,   // seq of the packet that started the section
    tableId: Int,
    syntaxIndicator: Boolean,
    sectionLength: Int,
    tableIdExtension: Int,
    versionNumber: Int,
    currentNext: Boolean,
    sectionNumber: Int,
    lastSectionNumber: Int,
    crcOk: Boolean,
    bytes: Array[Byte])

/** PAT row (`psi.h:192-217`): program 0 ⇒ network PID. */
case class PatRow(programNumber: Int, referencePid: Int)

/** Tagged descriptor TLV (`psi_desc.h:35-132`); tag-specific parses carried
  * in the optional fields, unknown tags keep `body` opaque. */
case class Descriptor(
    tag: Int,
    body: Array[Byte],
    serviceType: Option[Int],        // 0x48
    serviceProvider: Option[String], // 0x48
    serviceName: Option[String],     // 0x48
    subtitling: Option[Seq[SubtitlingEntry]]) // 0x59

case class SubtitlingEntry(
    lang: String,
    subtitlingType: Int,
    compositionPageId: Int,
    ancillaryPageId: Int)

/** PMT elementary-stream row (`psi.h:223-293`). */
case class EsEntry(
    streamType: Int,
    elementaryPid: Int,
    descriptors: Seq[Descriptor])

/** Parsed PMT section body. */
case class PmtProgram(
    programNumber: Int,
    pcrPid: Int,
    programDescriptors: Seq[Descriptor],
    es: Seq[EsEntry])

/** DVB-SDT service row (`psi_dvb.h:55-112`). */
case class SdtService(
    serviceId: Int,
    eitSchedule: Boolean,
    eitPresentFollowing: Boolean,
    runningStatus: Int,
    freeCa: Boolean,
    serviceName: Option[String],
    serviceProvider: Option[String])
